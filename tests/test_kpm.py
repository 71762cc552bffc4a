"""Kernel polynomial method (solvers/kpm.py)."""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu.ops.dense import dense_matrix
from quantum_basis_tpu.solvers.kpm import jackson_kernel, kpm_dos, kpm_moments
from tests.models_zoo import heisenberg_chain


def _setup(L=8):
    m, c = heisenberg_chain(L, "1/2")
    m.enumerate_basis_full([c["Sz"]], [0.0])
    s = m.sec_full[0]
    H = dense_matrix(m.compiled_Ham, s.labels).real
    evals = np.linalg.eigvalsh(H)
    return m, s, evals


def test_moments_match_exact_trace():
    """Stochastic moments converge to the exact Chebyshev trace; with many
    random vectors the estimate is within stochastic-noise tolerance."""
    m, s, evals = _setup(8)
    lo, hi = evals[0] - 0.1, evals[-1] + 0.1
    a, b = (hi - lo) / 2, (hi + lo) / 2
    x = (evals - b) / a
    N = 16
    exact = np.array([np.mean(np.cos(k * np.arccos(np.clip(x, -1, 1))))
                      for k in range(N)])
    mu = kpm_moments(s.matvec, s.dim, N, (lo, hi), n_random=64, seed=5)
    np.testing.assert_allclose(mu, exact, atol=0.08)


def test_dos_integrates_to_one_and_finds_spectrum():
    m, s, evals = _setup(8)
    lo, hi = evals[0] - 0.2, evals[-1] + 0.2
    mu = kpm_moments(s.matvec, s.dim, 64, (lo, hi), n_random=32, seed=1)
    E = np.linspace(lo + 1e-3, hi - 1e-3, 800)
    rho = kpm_dos(mu, E, (lo, hi))
    total = np.trapezoid(rho, E)
    assert abs(total - 1.0) < 0.05, total
    assert np.all(rho > -0.02)  # Jackson kernel keeps the DOS ~positive
    # essentially no weight outside the true spectrum
    outside = (E < evals[0] - 0.15) | (E > evals[-1] + 0.15)
    if outside.any():
        assert np.max(np.abs(rho[outside])) < 0.05


def test_jackson_kernel_normalization():
    g = jackson_kernel(32)
    assert abs(g[0] - 1.0) < 1e-12
    assert np.all(np.diff(g) < 1e-12)  # monotone damping
