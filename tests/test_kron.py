"""Tensor-factorized engine (ops/apply_kron.py, models/product.py).

Cross-checks the species-major factorized Hubbard formulation against the
site-major 'electron' encoding of the generic engines — two independent
algorithms AND two independent Jordan-Wigner orderings — plus the
reference's 4x2 golden value (trans_absent square_Fermi_Hubbard.cc:113).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "examples")


def _dense_from_op(op):
    """Materialize the operator as a dense matrix by applying to basis
    vectors (test sizes only)."""
    import jax.numpy as jnp

    n = op.N
    H = np.zeros((n, n))
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        y, _ = op.apply(op.params, (jnp.asarray(e), None))
        H[:, j] = np.asarray(y)
    return H


def test_kron_spectrum_matches_generic_2x2():
    """Full 36-dim spectrum of Hubbard 2x2 (2up, 2dn): factorized engine
    (species-major JW) vs generic engine (site-major JW 'electron')."""
    from square_fermi_hubbard import build, build_factorized

    import jax.numpy as jnp

    pm, ms = build_factorized(2, 2, Nf=2)
    assert pm.dim == 36
    op = pm.op(jnp.float64, layout="dense")
    Hk = _dense_from_op(op)
    np.testing.assert_allclose(Hk, Hk.T, atol=1e-12)

    m, lat, Nup, Ndn = build(2, 2)
    dim = m.enumerate_basis_full([Nup, Ndn], [2.0, 2.0])
    assert dim == 36
    from quantum_basis_tpu.ops.sparse import build_sparse_full

    ell = build_sparse_full(m.sec_full[0].matvec)
    Hg = _dense_from_op(_EllWrap(ell))

    ek = np.linalg.eigvalsh(Hk)
    eg = np.linalg.eigvalsh(Hg)
    np.testing.assert_allclose(ek, eg, atol=1e-10)


class _EllWrap:
    def __init__(self, ell):
        self.ell = ell
        self.N = ell.n
        self.params = ell.params

    def apply(self, params, x):
        return self.ell.apply(params, x)


def test_kron_ell_layout_matches_dense():
    """The exact-f64 ELL gather path computes the same apply as the dense
    matmul path (the two precision twins must be the same operator)."""
    from square_fermi_hubbard import build_factorized

    import jax.numpy as jnp

    pm, _ = build_factorized(2, 2, Nf=2)
    od = pm.op(jnp.float64, layout="dense")
    oe = pm.op(jnp.float64, layout="ell")
    rng = np.random.default_rng(7)
    x = rng.standard_normal(pm.dim)
    yd, _ = od.apply(od.params, (jnp.asarray(x), None))
    ye, _ = oe.apply(oe.params, (jnp.asarray(x), None))
    np.testing.assert_allclose(np.asarray(yd), np.asarray(ye), atol=1e-12)


def test_product_model_hubbard_4x2_golden():
    """E0 of Hubbard 4x2 half filling through ProductModel.locate_E0_lanczos
    (pure f64 thick restart) vs the reference golden -14.07605866."""
    from square_fermi_hubbard import build_factorized

    pm, _ = build_factorized(4, 2)
    assert pm.dim == 70 * 70
    E0 = pm.locate_E0_lanczos(mixed=False, ncv=16)
    assert abs(E0 - (-14.07605866)) < 1e-8, E0


def test_product_model_mixed_precision_pipeline():
    """The f32 bulk -> f64 RQI polish pipeline (the path the 4x4 flagship
    runs on the chip) reproduces the same golden on CPU."""
    from square_fermi_hubbard import build_factorized

    pm, _ = build_factorized(4, 2)
    E0 = pm.locate_E0_lanczos(mixed=True)
    assert abs(E0 - (-14.07605866)) < 1e-8, E0
    assert pm._last_residual < 1e-6


def test_measure_product_static_double_occupancy():
    """<n_up,0 n_dn,0> via measure_product_static equals the derivative
    check sum over the eigenvector computed directly."""
    from square_fermi_hubbard import build_factorized, N1

    from quantum_basis_tpu import Mopr, Opr
    from quantum_basis_tpu.ops.operators import OprProd

    pm, ms = build_factorized(4, 2)
    pm.locate_E0_lanczos(mixed=False, ncv=16)
    n0 = Mopr([OprProd(1.0, [Opr(0, 0, False, N1)])])
    docc = pm.measure_product_static(n0, n0)
    # direct: sum over psi^2 weighted by occ_up[r,0]*occ_dn[c,0]
    psi = np.asarray(pm.eigenvecs[0][0]).reshape(pm.na, pm.nb)
    sa = ms.sec_full[0]
    occ = ms.space.decode(sa.dbasis.labels_np)[:, 0].astype(float)
    direct = float(np.einsum("rc,r,c->", psi**2, occ, occ))
    assert abs(docc - direct) < 1e-9


def test_factorized_asymmetric_sector_matches_generic():
    """(N_up, N_dn) = (3, 2) on 4x2: the asymmetric-sector ProductModel
    (spin/charge-gap sectors of config #3) matches the generic site-major
    'electron' engine's ground state."""
    from square_fermi_hubbard import build, build_factorized_sector

    pm = build_factorized_sector(4, 2, 3, 2)
    assert pm.dim == 56 * 28
    E0_fac = pm.locate_E0_lanczos(mixed=False, ncv=16)

    m, lat, Nup, Ndn = build(4, 2)
    dim = m.enumerate_basis_full([Nup, Ndn], [3.0, 2.0])
    assert dim == pm.dim
    m.locate_E0_lanczos(nev=1, ncv=1)
    assert abs(E0_fac - m.eigenvals_full[0]) < 1e-8, \
        (E0_fac, m.eigenvals_full[0])
