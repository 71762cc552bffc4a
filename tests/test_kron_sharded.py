"""Mesh-sharded kron engine (parallel/kron_sharded.py, ProductModel mesh
route) on the virtual 8-device mesh.

The flagship Hubbard engine's multi-chip path: row-sharded psi, GSPMD
matmul partitioning, zero-row padding when the factor dimension does not
divide the mesh (70 -> 72 here — the padding path is exercised on
purpose). Verified against the single-device KronOp and the reference's
4x2 golden E0 (examples/trans_absent/latt_square/square_Fermi_Hubbard
.cc:113).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "examples")

_E0_4X2 = -14.07605866


def _mesh(n=8):
    from quantum_basis_tpu.parallel import basis_mesh

    return basis_mesh(n)


def test_kron_sharded_apply_matches_single_device():
    import jax.numpy as jnp

    from square_fermi_hubbard import build_factorized

    pm, _ = build_factorized(4, 2)  # factor dim 70: pads to 72 on 8 dev
    ell_a, ell_b = pm._factor_ells()
    from quantum_basis_tpu.ops.apply_kron import KronOp
    from quantum_basis_tpu.parallel.kron_sharded import KronSharded

    ref = KronOp(ell_a, ell_b, coupling=pm._coupling_matrix(),
                 coupling_scale=pm.coupling_scale, dtype=jnp.float64,
                 layout="dense")
    sh = KronSharded(ell_a, ell_b, coupling=pm._coupling_matrix(),
                     coupling_scale=pm.coupling_scale, mesh=_mesh(),
                     dtype=jnp.float64, layout="dense")
    assert sh.na == 72 and sh.na_logical == 70
    rng = np.random.default_rng(7)
    x = rng.standard_normal(pm.dim)
    y_ref, _ = ref((jnp.asarray(x), None))
    y_sh = sh.unpad(sh(sh.pad((x, None))))[0]
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=1e-11)
    # padded rows stay exactly zero
    yp = np.asarray(sh(sh.pad((x, None)))[0]).reshape(sh.na, sh.nb)
    assert np.all(yp[70:] == 0.0)


def test_product_model_mesh_golden_4x2():
    """ProductModel(mesh=...) public-API solve reproduces the golden E0
    through the sharded engine (pure-f64 thick restart on 8 devices)."""
    from square_fermi_hubbard import build_factorized

    pm, _ = build_factorized(4, 2)
    pm.set_mesh(_mesh())
    e0 = pm.locate_E0_lanczos(maxit=600, mixed=False)
    assert abs(e0 - _E0_4X2) < 1e-8
    # published eigenvector is logical-length (unpadded) and normalized
    v = np.asarray(pm.eigenvecs[0][0])
    assert v.shape == (pm.dim,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    # and is an actual eigenvector of the UNsharded engine
    import jax.numpy as jnp

    op = pm.op(jnp.float64)  # mesh attached: sharded op
    y = op.unpad(op(op.pad((v, None))))[0]
    resid = np.linalg.norm(np.asarray(y) - e0 * v)
    assert resid < 1e-7, resid


def test_product_model_mesh_matches_unsharded():
    from square_fermi_hubbard import build_factorized

    pm0, _ = build_factorized(4, 2, U=2.3)
    e_ref = pm0.locate_E0_lanczos(maxit=600, mixed=False)
    pm1, _ = build_factorized(4, 2, U=2.3)
    pm1.set_mesh(_mesh())
    e_sh = pm1.locate_E0_lanczos(maxit=600, mixed=False)
    assert abs(e_sh - e_ref) < 1e-9


def test_kron_sharded_mixed_pipeline():
    """The mixed-precision pipeline (f32 bulk -> f64 RQI polish) runs on
    the sharded engines end-to-end."""
    from square_fermi_hubbard import build_factorized

    pm, _ = build_factorized(4, 2)
    pm.set_mesh(_mesh())
    e0 = pm.locate_E0_lanczos(maxit=600, mixed=True)
    assert abs(e0 - _E0_4X2) < 1e-8
    assert pm._last_residual is None or pm._last_residual < 1e-6
