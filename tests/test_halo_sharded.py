"""Halo all-to-all sharded ELL SpMV vs the single-chip ELL apply."""

from __future__ import annotations

import numpy as np
import pytest

from quantum_basis_tpu.parallel import basis_mesh
from quantum_basis_tpu.parallel.halo_sharded import EllShardedHalo

from tests.models_zoo import heisenberg_chain, spinless_fermion_honeycomb

pytestmark = pytest.mark.multichip


def _rand(n, complex_vec, seed=5):
    rng = np.random.default_rng(seed)
    re = rng.normal(size=n)
    im = rng.normal(size=n) if complex_vec else None
    return (re, im)


def _check(ell, mesh, complex_vec):
    import jax.numpy as jnp

    hs = EllShardedHalo(ell, mesh)
    x = _rand(ell.n, complex_vec)
    xs = hs.pad(x)
    ys = hs.unpad(hs(xs))
    xr = jnp.asarray(x[0])
    xi = jnp.asarray(x[1]) if x[1] is not None else None
    y_ref = ell((xr, xi))
    np.testing.assert_allclose(ys[0], np.asarray(y_ref[0]), atol=1e-11)
    ref_i = (np.asarray(y_ref[1]) if y_ref[1] is not None
             else np.zeros(ell.n))
    got_i = ys[1] if ys[1] is not None else np.zeros(ell.n)
    np.testing.assert_allclose(got_i, ref_i, atol=1e-11)
    st = hs.halo_stats()
    assert st["halo_nnz"] >= 0
    assert st["exchanged_per_apply"] > 0
    return st


def test_halo_matches_ell_real():
    m, c = heisenberg_chain(12, "1/2")
    m.enumerate_basis_full([c["Sz"]], [0.0])
    ell = m.generate_Ham_sparse_full(0)
    st = _check(ell, basis_mesh(8), False)
    # never worse than replicating the whole vector (padding included)
    assert st["exchanged_per_apply"] <= st["allgather_per_apply"], st


def test_halo_banded_locality_win():
    """Index-local sparsity (the case the halo engine exists for): the
    exchange volume must be a small fraction of the all-gather."""
    from quantum_basis_tpu.ops.sparse import EllMatrix

    rng = np.random.default_rng(2)
    n, W, band = 8192, 6, 40
    rows = np.arange(n)[:, None]
    cols = np.clip(rows + rng.integers(-band, band + 1, size=(n, W)), 0,
                   n - 1)
    vre = rng.normal(size=(n, W))
    diag = rng.normal(size=n)
    ell = EllMatrix(cols, vre, None, diag)
    st = _check(ell, basis_mesh(8), False)
    assert st["traffic_ratio"] < 0.05, st


def test_halo_matches_ell_complex_repr():
    m, c = heisenberg_chain(12, "1/2")
    m.enumerate_basis_repr([2], [c["Sz"]], [0.0])
    ell = m.generate_Ham_sparse_repr(0)
    assert ell.is_complex
    _check(ell, basis_mesh(8), True)
    _check(ell, basis_mesh(8), False)   # complex H on a real vector


def test_halo_matches_ell_fermionic():
    m, o = spinless_fermion_honeycomb(3, 2)
    m.enumerate_basis_full([o["N"]], [4.0])
    ell = m.generate_Ham_sparse_full(0)
    _check(ell, basis_mesh(8), False)


def test_halo_ground_state():
    """Golden E0 with every matvec through the halo-exchange engine."""
    import jax.numpy as jnp

    from quantum_basis_tpu.solvers.lanczos import lanczos_ground
    from quantum_basis_tpu.utils.rng import vec_randomize

    m, c = heisenberg_chain(12, "1/2")
    m.enumerate_basis_full([c["Sz"]], [0.0])
    ell = m.generate_Ham_sparse_full(0)
    hs = EllShardedHalo(ell, basis_mesh(8))
    re, _ = vec_randomize(ell.n, seed=1)
    v0 = hs.pad((re, None))
    out = lanczos_ground(hs, v0, maxit=400)
    assert abs(out["E0"] - (-5.387390917445)) < 1e-8


def test_halo_small_odd_sizes():
    """n not divisible by the mesh: padding rows must stay inert."""
    from quantum_basis_tpu.ops.sparse import EllMatrix

    rng = np.random.default_rng(0)
    n, W = 37, 3
    cols = rng.integers(0, n, size=(n, W))
    vre = rng.normal(size=(n, W))
    diag = rng.normal(size=n)
    ell = EllMatrix(cols, vre, None, diag)
    _check(ell, basis_mesh(8), False)
