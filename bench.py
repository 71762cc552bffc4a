"""Benchmark: explicit-sparse (ELL) SpMV throughput on the flagship workload.

Runs on whatever backend JAX selects (the driver runs this on a real TPU
chip). Workload: spin-1/2 Heisenberg chain L=24, Sz=0 sector
(dim C(24,12) = 2,704,156; ~27 stored nnz per row including the diagonal) —
the hot kernel of every Lanczos/dynamics run in the framework.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no performance numbers (SURVEY.md §6); vs_baseline
is reported against a fixed nominal target of 1e9 nnz/s.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

_NOMINAL = 1.0e9  # nnz/s nominal target (no reference numbers exist)


def main():
    L = 24
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _chain_setup
    from quantum_basis_tpu.ops.apply import MatvecFull
    from quantum_basis_tpu.utils.rng import vec_randomize

    from quantum_basis_tpu.ops.sparse import build_sparse_full

    t0 = time.time()
    compiled, dbasis, labels = _chain_setup(L)
    mv = MatvecFull(compiled, dbasis)
    ell = build_sparse_full(mv)  # one device pass + host compaction
    n = labels.size
    re, _ = vec_randomize(n, seed=1)
    x = jnp.asarray(re)
    params = ell.params

    fn = jax.jit(lambda p, v: ell.apply(p, (v, None))[0])
    y = fn(params, x)
    jax.block_until_ready(y)  # compile + warm-up
    t_setup = time.time() - t0

    # timed: chained applies (like a Lanczos inner loop)
    iters = 20
    t1 = time.time()
    v = x
    for _ in range(iters):
        v = fn(params, v)
    jax.block_until_ready(v)
    dt = (time.time() - t1) / iters

    # nnz actually stored: diagonal + ELL width per row
    nnz = ell.nnz
    nnz_per_s = nnz / dt
    out = {
        "metric": "spmv_nnz_per_s",
        "value": round(nnz_per_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(nnz_per_s / _NOMINAL, 4),
        "detail": {
            "workload": f"heisenberg_chain_L{L}_Sz0",
            "dim": int(n),
            "nnz": int(nnz),
            "ms_per_apply": round(dt * 1e3, 3),
            "setup_s": round(t_setup, 1),
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
