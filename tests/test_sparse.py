"""Explicit sparse (ELL) path: extraction matches matrix-free, golden E0.

The reference treats the explicit CSR matrix as an optional speedup over
matrix-free application (src/main_test.cc:76-78); here we require the two
paths to agree to solver precision and reproduce golden energies.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.models_zoo import (fermi_hubbard_square, heisenberg_chain,
                              spinless_fermion_honeycomb)


def _rand_cvec(n, complex_vec, seed=5):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    re = jnp.asarray(rng.normal(size=n))
    im = jnp.asarray(rng.normal(size=n)) if complex_vec else None
    return (re, im)


def _close(a, b, tol=1e-11):
    ar, ai = a
    br, bi = b
    assert np.allclose(np.asarray(ar), np.asarray(br), atol=tol)
    za = np.zeros_like(np.asarray(ar))
    ai = za if ai is None else np.asarray(ai)
    bi = za if bi is None else np.asarray(bi)
    assert np.allclose(ai, bi, atol=tol)


def test_ell_matches_matrix_free_full_real():
    m, cons = heisenberg_chain(12, "1/2")
    m.enumerate_basis_full([cons["Sz"]], [0.0])
    mf = m.sec_full[0].matvec
    ell = m.generate_Ham_sparse_full(0)
    x = _rand_cvec(m.dim_full(0), False)
    _close(ell(x), mf(x))
    assert ell.width <= 24  # <= one image per exchange bond


def test_ell_matches_matrix_free_full_fermionic():
    m, ops = spinless_fermion_honeycomb(3, 2)
    m.enumerate_basis_full([ops["N"]], [4.0])
    mf = m.sec_full[0].matvec
    ell = m.generate_Ham_sparse_full(0)
    x = _rand_cvec(m.dim_full(0), ell.is_complex)
    _close(ell(x), mf(x))


def test_ell_golden_E0_through_sparse_path():
    m, cons = heisenberg_chain(16, "1/2")
    m.enumerate_basis_full([cons["Sz"]], [0.0])
    m.generate_Ham_sparse_full(0)
    m.locate_E0_lanczos(nev=1, ncv=1)
    assert abs(m.eigenvals_full[0] - (-7.142296361)) < 1e-8


def test_ell_matches_matrix_free_repr():
    m, cons = heisenberg_chain(12, "1/2")
    for k in (0, 1, 5):
        m.enumerate_basis_repr([k], [cons["Sz"]], [0.0])
        mf = m.sec_repr[0].matvec
        ell = m.generate_Ham_sparse_repr(0)
        x = _rand_cvec(m.dim_repr(0), True, seed=k + 1)
        _close(ell(x), mf(x))


def test_ell_repr_golden_E0k():
    """E0(k) through the explicit repr matrix (golden values,
    examples/trans_symmetric/latt_chain/chain_Heisenberg_spin_half.cc)."""
    golden = {0: -7.142296361, 1: -6.523407057, 8: -6.872106678}
    m, cons = heisenberg_chain(16, "1/2")
    for k, e0 in golden.items():
        m.enumerate_basis_repr([k], [cons["Sz"]], [0.0])
        m.generate_Ham_sparse_repr(0)
        m.locate_E0_lanczos(which="repr", sec=0)
        assert abs(m.eigenvals_repr[0] - e0) < 1e-8, (k, m.eigenvals_repr[0])


def test_hermiticity_probe_catches_breakage():
    from quantum_basis_tpu.ops.sparse import EllMatrix, hermiticity_probe

    n = 32
    rng = np.random.default_rng(0)
    # non-Hermitian: random ELL with no mirrored entries
    cols = rng.integers(0, n, size=(n, 3))
    vre = rng.normal(size=(n, 3))
    ell = EllMatrix(cols, vre, None, np.zeros(n))
    with pytest.raises(AssertionError):
        hermiticity_probe(ell, n, False)


def test_ell_fermi_hubbard_golden():
    m, ops = fermi_hubbard_square(4, 2)
    m.enumerate_basis_full([ops["Nup"], ops["Ndn"]], [4.0, 4.0])
    m.generate_Ham_sparse_full(0)
    m.locate_E0_lanczos(nev=1, ncv=1)
    assert abs(m.eigenvals_full[0] - (-14.07605866)) < 1e-8


def test_hermiticity_exact_passes_and_catches_single_entry():
    """The exact O(nnz) verification (reference src/sparse.cc:235-256
    parity) passes a real model and catches a single-entry asymmetry
    small enough to hide below the randomized probe's global tolerance."""
    import jax.numpy as jnp

    from quantum_basis_tpu.ops.sparse import (hermiticity_exact,
                                              hermiticity_probe)

    m, cons = heisenberg_chain(10, "1/2")
    m.enumerate_basis_full([cons["Sz"]], [0.0])
    ell = m.generate_Ham_sparse_full(0, check="exact")  # passes

    # surgically break ONE stored off-diagonal entry by 1e-10 — far below
    # what the randomized probe's global 1e-9 tolerance can resolve, but a
    # per-entry comparison pins it immediately
    vre = np.asarray(ell.vre).copy()
    idx = np.argwhere(np.abs(vre) > 0.1)[0]
    vre[idx[0], idx[1]] += 1e-10
    ell.vre = jnp.asarray(vre)
    hermiticity_probe(ell, ell.n, ell.is_complex)  # too small for the probe
    with pytest.raises(AssertionError, match="not Hermitian"):
        hermiticity_exact(ell, tol=1e-11)


def test_hermiticity_exact_catches_unpaired_entry():
    import jax.numpy as jnp

    from quantum_basis_tpu.ops.sparse import hermiticity_exact

    m, cons = heisenberg_chain(8, "1/2")
    m.enumerate_basis_full([cons["Sz"]], [0.0])
    ell = m.generate_Ham_sparse_full(0, check=False)
    vre = np.asarray(ell.vre).copy()
    cols = np.asarray(ell.cols).copy()
    # retarget one entry to a column whose transpose partner does not exist
    i = int(np.argwhere(np.abs(vre) > 0.1)[0][0])
    cols[i, 0] = (cols[i, 0] + 1) % ell.n
    ell.cols = jnp.asarray(cols)
    with pytest.raises(AssertionError, match="unpaired|not Hermitian"):
        hermiticity_exact(ell)
