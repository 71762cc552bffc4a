"""Multi-host entry points (parallel/distributed.py) on the virtual mesh.

A real multi-process run needs >1 host; here we verify the single-process
fallback contract and that the global-mesh helpers drive the GSPMD engine
identically to the hand-built mesh (the multi-host path is the same code —
only jax.devices() grows)."""

from __future__ import annotations

import numpy as np
import pytest

from quantum_basis_tpu.ops.apply_fullspace import FullSpaceOp
from quantum_basis_tpu.parallel import (global_basis_mesh, init_distributed,
                                        process_info, shard_array_over_mesh)
from quantum_basis_tpu.parallel.fullspace_sharded import FullSpaceSharded
from tests.models_zoo import heisenberg_chain


def test_init_distributed_single_process_fallback():
    multi = init_distributed()
    assert multi is False  # one process in the test env
    pid, pcount, nlocal, nglobal = process_info()
    assert (pid, pcount) == (0, 1)
    assert nlocal == nglobal == 8  # virtual device mesh
    # idempotent
    assert init_distributed() is False


def test_global_mesh_drives_gspmd_engine():
    import jax.numpy as jnp

    init_distributed()
    mesh = global_basis_mesh()
    assert mesh.devices.size == 8

    m, c = heisenberg_chain(10, "1/2")
    m.enumerate_basis_full([c["Sz"]], [0.0])
    s = m.sec_full[0]
    fs = FullSpaceOp(m.compiled_Ham, s.labels)
    fss = FullSpaceSharded(fs, mesh)
    rng = np.random.default_rng(3)
    x = rng.normal(size=s.dim)
    xs = (jnp.asarray(x), None)
    y_ref = fs(fs.to_full(xs))
    y = fss(fss.to_full(xs))
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y_ref[0]),
                               atol=1e-12)
    assert len(y[0].sharding.device_set) == 8


def test_shard_array_over_mesh_roundtrip():
    init_distributed()
    mesh = global_basis_mesh()
    x = np.arange(64, dtype=np.float64)
    arr = shard_array_over_mesh(x, mesh)
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), x)
