"""Kernel polynomial method: Chebyshev moments, Jackson kernel, DOS.

The reference's kpm.cc contains only the spectral-bounds step
(``energy_scale``, src/kpm.cc:45-99) — no moment loop. This module supplies
the full KPM on top of the same bounds: stochastic-trace Chebyshev moments
with the doubling trick (two moments per matvec), Jackson damping, and
density-of-states / spectral-function reconstruction. All device work is a
``lax.scan`` over the three-term recurrence — pure BLAS1 + matvec, so every
engine (fullspace rolls, ELL, matrix-free) plugs in.
"""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu.ops import cplx as cx
from quantum_basis_tpu.utils.rng import vec_randomize


def kpm_moments(matvec, n: int, n_moments: int, e_bounds, n_random: int = 8,
                seed: int = 3, complex_vec: bool = False,
                mask=None) -> np.ndarray:
    """mu[m] ~ Tr T_m(H~) / n by stochastic trace estimation.

    ``e_bounds = (e_min, e_max)`` rescales H to [-1, 1] (use
    solvers.lanczos.energy_scale, the reference's spectral-bounds step).
    With the doubling trick each matvec yields two moments:
    mu_{2k} = 2 <t_k|t_k> - mu_0, mu_{2k+1} = 2 <t_{k+1}|t_k> - mu_1.
    ``mask`` restricts random vectors to a sector (full-space engine).
    """
    import jax
    import jax.numpy as jnp

    e_min, e_max = float(e_bounds[0]), float(e_bounds[1])
    a = (e_max - e_min) / 2.0
    b = (e_max + e_min) / 2.0
    params = matvec.params
    half = (n_moments + 2) // 2

    def hs(x):
        y = matvec.apply(params, x)
        return cx.scale(cx.axpy(-b, x, y), 1.0 / a)

    def step(carry, _):
        t_prev, t_cur = carry
        t_next = cx.sub(cx.scale(hs(t_cur), 2.0), t_prev)
        m_even = cx.vdot_re(t_cur, t_cur)
        m_odd = cx.vdot_re(t_next, t_cur)
        return (t_cur, t_next), (m_even, m_odd)

    @jax.jit
    def run(r):
        t0 = r
        t1 = hs(t0)
        mu0 = cx.vdot_re(t0, t0)
        mu1 = cx.vdot_re(t1, t0)
        (_, _), (evens, odds) = jax.lax.scan(step, (t0, t1),
                                             None, length=half)
        return mu0, mu1, evens, odds

    acc = np.zeros(2 * half + 2)
    for r_i in range(n_random):
        re, im = vec_randomize(n, seed=seed + 17 * r_i,
                               complex_valued=complex_vec)
        if mask is not None:
            mnp = np.asarray(mask)
            re = re * mnp
            nrm = np.linalg.norm(re) if im is None else np.sqrt(
                np.sum(re * re) + np.sum((im * mnp) ** 2))
            re = re / max(nrm, 1e-300)
            im = None if im is None else im * mnp / max(nrm, 1e-300)
        r = (jnp.asarray(re), jnp.asarray(im) if im is not None else None)
        mu0, mu1, evens, odds = run(r)
        acc[0] += float(mu0)
        acc[1] += float(mu1)
        acc[2: 2 + 2 * half: 2] += 2.0 * np.asarray(evens) - float(mu0)
        acc[3: 3 + 2 * half: 2] += 2.0 * np.asarray(odds) - float(mu1)
    return acc[:n_moments] / n_random


def jackson_kernel(n_moments: int) -> np.ndarray:
    """Jackson damping factors g_m (optimal positivity-preserving kernel)."""
    N = n_moments
    m = np.arange(N)
    return ((N - m + 1) * np.cos(np.pi * m / (N + 1))
            + np.sin(np.pi * m / (N + 1)) / np.tan(np.pi / (N + 1))) / (N + 1)


def kpm_dos(moments: np.ndarray, energies, e_bounds,
            kernel: str = "jackson") -> np.ndarray:
    """Density of states rho(E) reconstructed from KPM moments (per state:
    integrates to 1 over the spectrum)."""
    e_min, e_max = float(e_bounds[0]), float(e_bounds[1])
    a = (e_max - e_min) / 2.0
    b = (e_max + e_min) / 2.0
    x = (np.asarray(energies, dtype=np.float64) - b) / a
    x = np.clip(x, -1 + 1e-12, 1 - 1e-12)
    N = moments.size
    g = jackson_kernel(N) if kernel == "jackson" else np.ones(N)
    theta = np.arccos(x)
    out = g[0] * moments[0] * np.ones_like(x)
    for m in range(1, N):
        out += 2.0 * g[m] * moments[m] * np.cos(m * theta)
    return out / (np.pi * np.sqrt(1.0 - x * x) * a)
