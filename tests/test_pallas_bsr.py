"""Pallas BSR SpMV kernel vs the ELL apply (interpret mode on CPU).

The kernel itself runs compiled on the chip via the bench/solver paths; here
``interpret=True`` runs the identical kernel logic through the Pallas
interpreter, cross-checked against the gather-formulation ELL apply on real
model matrices: real full-sector, complex momentum-sector, and fermionic
cases, plus a full Lanczos ground-state solve through the kernel.
"""

from __future__ import annotations

import numpy as np
import pytest

from quantum_basis_tpu.ops.pallas_bsr import bsr_fill_stats, ell_to_bsr

from tests.models_zoo import heisenberg_chain, spinless_fermion_honeycomb


def _rand_cvec(n, complex_vec, seed=3):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    re = jnp.asarray(rng.normal(size=n))
    im = jnp.asarray(rng.normal(size=n)) if complex_vec else None
    return (re, im)


def _close(a, b, tol=1e-11):
    ar, ai = a
    br, bi = b
    np.testing.assert_allclose(np.asarray(ar), np.asarray(br), atol=tol)
    za = np.zeros_like(np.asarray(ar))
    ai = za if ai is None else np.asarray(ai)
    bi = za if bi is None else np.asarray(bi)
    np.testing.assert_allclose(ai, bi, atol=tol)


def test_bsr_matches_ell_real():
    m, cons = heisenberg_chain(10, "1/2")
    m.enumerate_basis_full([cons["Sz"]], [0.0])
    ell = m.generate_Ham_sparse_full(0)
    bsr = ell_to_bsr(ell, interpret=True)
    assert not bsr.is_complex
    x = _rand_cvec(ell.n, False)
    _close(bsr(x), ell(x))


def test_bsr_matches_ell_complex_repr():
    # k != 0, L/2 momentum sector: complex phases -> split-complex blocks
    m, cons = heisenberg_chain(12, "1/2")
    m.enumerate_basis_repr([1], [cons["Sz"]], [0.0])
    ell = m.generate_Ham_sparse_repr(0)
    assert ell.is_complex
    bsr = ell_to_bsr(ell, interpret=True)
    assert bsr.is_complex
    x = _rand_cvec(ell.n, True)
    _close(bsr(x), ell(x))


def test_bsr_matches_ell_fermionic():
    m, ops = spinless_fermion_honeycomb(3, 2)
    m.enumerate_basis_full([ops["N"]], [4.0])
    ell = m.generate_Ham_sparse_full(0)
    bsr = ell_to_bsr(ell, interpret=True)
    x = _rand_cvec(ell.n, ell.is_complex)
    _close(bsr(x), ell(x))


def test_bsr_real_matrix_complex_vector():
    m, cons = heisenberg_chain(8, "1/2")
    m.enumerate_basis_full([cons["Sz"]], [0.0])
    ell = m.generate_Ham_sparse_full(0)
    bsr = ell_to_bsr(ell, interpret=True)
    x = _rand_cvec(ell.n, True)
    _close(bsr(x), ell(x))


def test_bsr_fill_stats_consistent():
    m, cons = heisenberg_chain(10, "1/2")
    m.enumerate_basis_full([cons["Sz"]], [0.0])
    ell = m.generate_Ham_sparse_full(0)
    st = bsr_fill_stats(ell)
    bsr = ell_to_bsr(ell, interpret=True)
    assert st["n_blocks"] == bsr.nb
    assert st["stored"] == bsr.nb * 128 * 128
    assert 0.0 < st["fill"] <= 1.0
    vre = np.asarray(ell.vre)
    mag = np.abs(vre) + (np.abs(np.asarray(ell.vim))
                         if ell.vim is not None else 0.0)
    assert st["nnz"] == int((mag > 0).sum())


def test_bsr_ground_state_through_kernel():
    """Golden E0 via Lanczos with every matvec through the Pallas kernel."""
    from quantum_basis_tpu.solvers.lanczos import lanczos_ground
    from quantum_basis_tpu.utils.rng import vec_randomize

    m, cons = heisenberg_chain(12, "1/2")
    m.enumerate_basis_full([cons["Sz"]], [0.0])
    ell = m.generate_Ham_sparse_full(0)
    bsr = ell_to_bsr(ell, interpret=True)
    import jax.numpy as jnp

    re, im = vec_randomize(ell.n, seed=1)
    v0 = (jnp.asarray(re), None)
    e_bsr = lanczos_ground(bsr, v0, maxit=300)["E0"]
    e_ell = lanczos_ground(ell, v0, maxit=300)["E0"]
    assert abs(e_bsr - e_ell) < 1e-9


def test_bsr_covers_rowtiles_without_blocks():
    """Row tiles with no off-diagonal block must still be written (zero
    blocks are inserted) — on real hardware an unvisited output tile holds
    garbage; interpret mode hides that, so assert the coverage directly."""
    from quantum_basis_tpu.ops.sparse import EllMatrix

    n = 520  # 5 row tiles (last partial)
    # single off-diagonal entry, confined to tile (0, 0)
    cols = np.zeros((n, 1), dtype=np.int64)
    vre = np.zeros((n, 1))
    cols[3, 0] = 7
    vre[3, 0] = 2.5
    diag = np.arange(n, dtype=np.float64)
    ell = EllMatrix(cols, vre, None, diag)
    bsr = ell_to_bsr(ell, interpret=True)
    bi = np.asarray(bsr._bi)
    assert set(bi.tolist()) == set(range(-(-n // 128))), bi
    # first flag marks each new row tile exactly once
    first = np.asarray(bsr._first)
    assert first.sum() == -(-n // 128)
    x = _rand_cvec(n, False)
    _close(bsr(x), ell(x))
    st = bsr_fill_stats(ell)
    assert st["n_blocks"] == bsr.nb == 5


def test_bsr_diagonal_only_matrix():
    """Purely diagonal H: every row tile is a coverage zero block."""
    from quantum_basis_tpu.ops.sparse import EllMatrix

    n = 300
    cols = np.zeros((n, 0), dtype=np.int64)
    vre = np.zeros((n, 0))
    diag = np.linspace(-1.0, 1.0, n)
    ell = EllMatrix(cols, vre, None, diag)
    bsr = ell_to_bsr(ell, interpret=True)
    assert bsr.nb == -(-n // 128)
    x = _rand_cvec(n, False)
    _close(bsr(x), ell(x))


def test_bsr_routed_golden_momentum_sector(monkeypatch):
    """A golden momentum sector solved END TO END on the BSR kernel via the
    public Model API: chain-16 k=0, E0 = -7.142296361 (reference golden,
    trans_symmetric chain_Heisenberg_spin_half.cc:102). config.prefer_bsr
    forces the routing (interpret-mode kernel on CPU); the projected
    full-space fast path is disabled so the explicit-sparse branch runs."""
    from quantum_basis_tpu import config
    from quantum_basis_tpu.models.model import Model
    from models_zoo import heisenberg_chain

    monkeypatch.setattr(config, "prefer_bsr", True)
    monkeypatch.setattr(Model, "_fullspace_repr_op",
                        lambda self, sector, dtype=None: None)
    m, ops = heisenberg_chain(16)
    m.enumerate_basis_repr([0], [ops["Sz"]], [0.0])
    m.locate_E0_lanczos(which="repr")
    assert abs(m.eigenvals_repr[0] - (-7.142296361)) < 1e-8
    # the production route: f32 BSR bulk + f64 ELL RQI polish
    from quantum_basis_tpu.ops.pallas_bsr import BsrMatrix

    bsr32 = m.sec_repr[0]._bsr32
    assert isinstance(bsr32, BsrMatrix)
    assert bsr32.dtype == __import__("numpy").float32
