"""Full-label-space roll engine (ops/apply_fullspace.py)."""

from __future__ import annotations

import numpy as np
import pytest

from quantum_basis_tpu.ops.apply_fullspace import (FullSpaceOp,
                                                   supports_fullspace)
from tests.models_zoo import (bose_hubbard_square, fermi_hubbard_square,
                              heisenberg_chain, kagome_tj,
                              spinless_fermion_honeycomb)


def _match(m, conserve, vals):
    import jax.numpy as jnp

    m.enumerate_basis_full(conserve, vals)
    s = m.sec_full[0]
    mf = s.matvec
    assert supports_fullspace(m.compiled_Ham)
    fs = FullSpaceOp(m.compiled_Ham, s.labels)
    rng = np.random.default_rng(7)
    x = rng.normal(size=s.dim)
    xi = rng.normal(size=s.dim) if mf.is_complex else None
    xs = (jnp.asarray(x), jnp.asarray(xi) if xi is not None else None)
    y_ref = mf(xs)
    ys = fs.to_sector(fs(fs.to_full(xs)))
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(y_ref[0]),
                               atol=1e-11)
    if y_ref[1] is not None:
        got = np.asarray(ys[1]) if ys[1] is not None else np.zeros(s.dim)
        np.testing.assert_allclose(got, np.asarray(y_ref[1]), atol=1e-11)
    # out-of-sector amplitudes must remain exactly zero
    yf = fs(fs.to_full(xs))
    leak = np.asarray(yf[0]) * (1.0 - np.asarray(fs.mask))
    assert np.max(np.abs(leak)) == 0.0


def test_fullspace_matches_spin_chain():
    m, c = heisenberg_chain(10, "1/2")
    _match(m, [c["Sz"]], [0.0])


def test_fullspace_matches_fermionic_jw():
    m, o = spinless_fermion_honeycomb(3, 2)
    _match(m, [o["N"]], [4.0])


def test_fullspace_matches_electron_hubbard():
    m, o = fermi_hubbard_square(4, 2)
    _match(m, [o["Nup"], o["Ndn"]], [4.0, 4.0])


def test_fullspace_matches_boson():
    m, o = bose_hubbard_square(2, 2, 2)
    _match(m, [o["N"]], [4.0])


def test_fullspace_rejects_tj():
    """t-J has d=3 fermionic slots — popcount JW is impossible; the engine
    must refuse so callers fall back (reference parity requires exactness)."""
    m, o = kagome_tj(1, 2)
    m.space  # build
    assert not supports_fullspace(m.compiled_Ham)


def test_fullspace_golden_E0_chain16():
    """Golden E0 through the fullspace solver path (src/main_test.cc:88)."""
    m, c = heisenberg_chain(16, "1/2")
    m.enumerate_basis_full([c["Sz"]], [0.0])
    s = m.sec_full[0]
    fs = m._fullspace_op(s)
    assert fs is not None
    m.locate_E0_lanczos(nev=1, ncv=1)
    assert abs(m.eigenvals_full[0] - (-7.142296361)) < 1e-8
    # eigenvector stored in sector coordinates
    vr, vi = m.eigenvecs_full[0]
    assert np.asarray(vr).shape == (s.dim,)
    # measurement machinery keeps working on the sector coordinates
    from tests.models_zoo import SP_HALF
    from quantum_basis_tpu.ops.operators import Mopr, Opr, OprProd

    corr = m.measure_full_static(
        Mopr([OprProd(1.0, [Opr(0, 0, False, SP_HALF["Sz"]),
                            Opr(1, 0, False, SP_HALF["Sz"])])]), 0, 0)
    assert abs(corr.real - (-0.1487978408)) < 1e-8


def test_fullspace_golden_hubbard():
    m, o = fermi_hubbard_square(4, 2)
    m.enumerate_basis_full([o["Nup"], o["Ndn"]], [4.0, 4.0])
    assert m._fullspace_op(m.sec_full[0]) is not None
    m.locate_E0_lanczos(nev=1, ncv=1)
    assert abs(m.eigenvals_full[0] - (-14.07605866)) < 1e-8
