"""Sharded full-space roll engine over the 8-device CPU mesh."""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu.ops.apply_fullspace import FullSpaceOp
from quantum_basis_tpu.parallel import basis_mesh
from quantum_basis_tpu.parallel.fullspace_sharded import FullSpaceSharded
from tests.models_zoo import heisenberg_chain, spinless_fermion_honeycomb


def _check(m, conserve, vals):
    import jax
    import jax.numpy as jnp

    m.enumerate_basis_full(conserve, vals)
    s = m.sec_full[0]
    fs = FullSpaceOp(m.compiled_Ham, s.labels)
    mesh = basis_mesh(8)
    fss = FullSpaceSharded(fs, mesh)
    rng = np.random.default_rng(11)
    x = rng.normal(size=s.dim)
    xi = rng.normal(size=s.dim) if fs.is_complex else None
    xs = (jnp.asarray(x), jnp.asarray(xi) if xi is not None else None)
    xf = fs.to_full(xs)
    y1 = fs(xf)
    y2 = fss(fss.to_full(xs))
    np.testing.assert_allclose(np.asarray(y2[0]), np.asarray(y1[0]),
                               atol=1e-12)
    if y1[1] is not None:
        np.testing.assert_allclose(np.asarray(y2[1]), np.asarray(y1[1]),
                                   atol=1e-12)
    # output really is sharded over the mesh
    assert len(y2[0].sharding.device_set) == 8


def test_sharded_fullspace_chain():
    m, c = heisenberg_chain(10, "1/2")
    _check(m, [c["Sz"]], [0.0])


def test_sharded_fullspace_fermions():
    m, o = spinless_fermion_honeycomb(3, 2)
    _check(m, [o["N"]], [4.0])


def test_sharded_fullspace_lanczos_step():
    """One full Lanczos iteration jitted over the mesh (psum reductions)."""
    import jax
    import jax.numpy as jnp

    m, c = heisenberg_chain(10, "1/2")
    m.enumerate_basis_full([c["Sz"]], [0.0])
    s = m.sec_full[0]
    fs = FullSpaceOp(m.compiled_Ham, s.labels)
    mesh = basis_mesh(8)
    fss = FullSpaceSharded(fs, mesh)

    @jax.jit
    def lstep(params, v):
        w, _ = fss.apply(params, (v, None))
        a = jnp.vdot(v, w)
        w = w - a * v
        b = jnp.linalg.norm(w)
        return w / jnp.maximum(b, 1e-300), a, b

    rng = np.random.default_rng(0)
    v0 = rng.normal(size=fs.N) * np.asarray(fs.mask)
    v0 /= np.linalg.norm(v0)
    v0 = jax.device_put(jnp.asarray(v0), fss.sharding)
    v1, a, b = lstep(fss.params, v0)
    jax.block_until_ready(v1)
    assert np.isfinite(float(a)) and np.isfinite(float(b))
    assert len(v1.sharding.device_set) == 8
