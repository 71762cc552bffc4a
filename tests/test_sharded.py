"""Sharded apply on the 8-virtual-device CPU mesh vs single-chip path."""

import numpy as np
import pytest

from quantum_basis_tpu.basis.enumerate import enumerate_basis
from quantum_basis_tpu.basis.site_basis import SiteBasis
from quantum_basis_tpu.basis.state import StateSpace
from quantum_basis_tpu.ops.apply import DeviceBasis, MatvecFull
from quantum_basis_tpu.ops.compile import compile_operator
from quantum_basis_tpu.parallel import MatvecSharded, basis_mesh
from quantum_basis_tpu.solvers.lanczos import lanczos_ground
from quantum_basis_tpu.utils.rng import vec_randomize

from test_apply import heisenberg_mopr, sz_total, tj_mopr, n_total


@pytest.mark.multichip
def test_sharded_matches_single_real():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    L = 12
    space = StateSpace([(SiteBasis.named("spin-1/2"), L)])
    labels = enumerate_basis(space, [sz_total(L)], [0.0])
    compiled = compile_operator(heisenberg_mopr(L), space)
    dbasis = DeviceBasis(space, labels, block_rows=64)
    mv1 = MatvecFull(compiled, dbasis)
    mesh = basis_mesh(8)
    mvs = MatvecSharded(compiled, dbasis, mesh)

    rng = np.random.default_rng(3)
    x = rng.standard_normal(labels.size)
    y1 = np.asarray(mv1((np.asarray(x), None))[0])
    xs = mvs.pad((x, None))
    ys = mvs.unpad(mvs(xs))[0]
    np.testing.assert_allclose(ys, y1, atol=1e-12)


@pytest.mark.multichip
def test_sharded_matches_single_fermionic():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    L = 8
    space = StateSpace([(SiteBasis.named("tJ"), L)])
    labels = enumerate_basis(space, [n_total(L)], [4.0])
    compiled = compile_operator(tj_mopr(L), space)
    dbasis = DeviceBasis(space, labels, block_rows=32)
    mv1 = MatvecFull(compiled, dbasis)
    mesh = basis_mesh(8)
    mvs = MatvecSharded(compiled, dbasis, mesh)

    rng = np.random.default_rng(4)
    x = rng.standard_normal(labels.size)
    y1 = np.asarray(mv1((np.asarray(x), None))[0])
    xs = mvs.pad((x, None))
    ys = mvs.unpad(mvs(xs))[0]
    np.testing.assert_allclose(ys, y1, atol=1e-12)


@pytest.mark.multichip
def test_sharded_lanczos_ground():
    """Full Lanczos ground-state run over the sharded matvec."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    L = 10
    space = StateSpace([(SiteBasis.named("spin-1/2"), L)])
    labels = enumerate_basis(space, [sz_total(L)], [0.0])
    compiled = compile_operator(heisenberg_mopr(L), space)
    dbasis = DeviceBasis(space, labels, block_rows=16)
    mesh = basis_mesh(8)
    mvs = MatvecSharded(compiled, dbasis, mesh)

    from quantum_basis_tpu.ops.dense import dense_matrix

    evals = np.linalg.eigvalsh(dense_matrix(compiled, labels).real)
    re, _ = vec_randomize(labels.size, seed=1)
    v0 = mvs.pad((re, None))
    res = lanczos_ground(mvs, v0, maxit=600, inner=40)
    assert abs(res["E0"] - evals[0]) < 1e-9
