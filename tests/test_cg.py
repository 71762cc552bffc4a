"""eigenvec_CG refinement (reference: src/lanczos.cc:281-341)."""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu.solvers.cg import eigenvec_cg
from tests.models_zoo import heisenberg_chain


def test_cg_polishes_perturbed_ground_state():
    import jax.numpy as jnp

    m, cons = heisenberg_chain(12, "1/2")
    m.enumerate_basis_full([cons["Sz"]], [0.0])
    m.locate_E0_lanczos(nev=1, ncv=1)
    E0 = m.eigenvals_full[0]
    vr, vi = m.eigenvecs_full[0]
    v = np.asarray(vr)
    rng = np.random.default_rng(2)
    noisy = v + 1e-3 * rng.normal(size=v.size)
    noisy /= np.linalg.norm(noisy)

    mv = m.sec_full[0].matvec
    out, res, iters = eigenvec_cg(mv, E0, (jnp.asarray(noisy), None),
                                  maxit=500)
    assert res < 1e-9, res
    overlap = abs(np.vdot(np.asarray(out[0]), v))
    assert overlap > 1.0 - 1e-10, overlap


def test_cg_complex_sector():
    import jax.numpy as jnp

    m, cons = heisenberg_chain(10, "1/2")
    m.enumerate_basis_repr([2], [cons["Sz"]], [0.0])
    m.locate_E0_lanczos(which="repr")
    E0 = m.eigenvals_repr[0]
    vr, vi = m.eigenvecs_repr[0]
    v = np.asarray(vr) + 1j * np.asarray(vi)
    rng = np.random.default_rng(4)
    noisy = v + 1e-3 * (rng.normal(size=v.size) + 1j * rng.normal(size=v.size))
    noisy /= np.linalg.norm(noisy)
    mv = m.sec_repr[0].matvec
    out, res, iters = eigenvec_cg(
        mv, E0, (jnp.asarray(noisy.real.copy()), jnp.asarray(noisy.imag.copy())),
        maxit=500)
    assert res < 1e-9, res
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    assert abs(np.vdot(got, v)) > 1.0 - 1e-9
