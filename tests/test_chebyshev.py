"""KPM moments, spectral density, Emax, and Chebyshev-windowed eigensolving."""

import numpy as np

from quantum_basis_tpu.solvers.chebyshev import (
    eigs_window,
    kpm_density,
    kpm_moments,
)
from quantum_basis_tpu.utils.rng import vec_randomize

from test_solvers import _chain_setup


def test_kpm_moments_vs_dense():
    import jax.numpy as jnp

    mv, Hd, n = _chain_setup(8)  # dim 70
    evals, evecs = np.linalg.eigh(Hd)
    re, _ = vec_randomize(n, seed=3)
    v = (jnp.asarray(re), None)
    bounds = (evals[0] - 0.1, evals[-1] + 0.1)
    n_mom = 32
    mu, e_min, e_max = kpm_moments(mv, v, n_mom, bounds=bounds)
    # exact moments via the eigendecomposition
    c = 0.5 * (e_max + e_min)
    d = 0.5 * (e_max - e_min)
    xs = (evals - c) / d
    w = (evecs.T @ (re / np.linalg.norm(re))) ** 2
    exact = np.array([np.sum(w * np.cos(k * np.arccos(xs)))
                      for k in range(n_mom)])
    np.testing.assert_allclose(mu, exact, atol=1e-10)


def test_kpm_density_integrates_to_one():
    import jax.numpy as jnp

    mv, Hd, n = _chain_setup(8)
    evals = np.linalg.eigvalsh(Hd)
    re, _ = vec_randomize(n, seed=4)
    v = (jnp.asarray(re), None)
    mu, e_min, e_max = kpm_moments(mv, v, 64)
    es = np.linspace(e_min + 1e-3, e_max - 1e-3, 4001)
    rho = kpm_density(mu, e_min, e_max, es)
    integral = np.trapezoid(rho, es)
    assert abs(integral - 1.0) < 0.02
    assert e_min <= evals[0] and e_max >= evals[-1]


def test_locate_emax_matches_dense():
    mv, Hd, n = _chain_setup(10)  # dim 252
    evals = np.linalg.eigvalsh(Hd)
    from quantum_basis_tpu.solvers.restarted import eigs_smallest

    got, _ = eigs_smallest(mv, n, nev=2, ncv=12, maxit=600, which="LA")
    np.testing.assert_allclose(got, evals[::-1][:2], atol=1e-9)


def test_eigs_window_interior():
    mv, Hd, n = _chain_setup(10)
    evals = np.linalg.eigvalsh(Hd)
    # a window strictly inside the spectrum containing a handful of levels
    lo, hi = evals[4] - 1e-6, evals[9] + 1e-6
    want = evals[(evals >= lo) & (evals <= hi)]
    got, vecs = eigs_window(mv, n, lo, hi, nev_max=12, degree=300, n_iter=40,
                            bounds=(evals[0] - 0.2, evals[-1] + 0.2))
    got = np.sort(got)
    assert got.size == want.size, (got, want)
    np.testing.assert_allclose(got, want, atol=1e-7)
    # Ritz vectors are true eigenvectors
    for t, (vr, vi) in zip(got, vecs[: got.size]):
        v = np.asarray(vr)
        r = Hd @ v - t * v
        assert np.linalg.norm(r) < 1e-5