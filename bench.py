"""Benchmark: full-space roll-engine SpMV throughput on the flagship workload.

Runs on whatever backend JAX selects (the driver runs this on a real TPU
chip). Workload: spin-1/2 Heisenberg chain L=24, Sz=0 sector
(dim C(24,12) = 2,704,156; 67.6M sector nonzeros per apply) — the hot kernel
of every Lanczos/dynamics run in the framework.

Engine: ops/apply_fullspace.py — Hamiltonian terms as masked rolls over the
full 2^24 label space (no gathers). The metric counts the SECTOR matrix
nonzeros actually applied (exact device count at setup), so it is directly
comparable to a CSR SpMV nnz/s number.

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
    from quantum_basis_tpu.ops.apply_fullspace import FullSpaceOp
    from quantum_basis_tpu.utils.rng import vec_randomize

    t0 = time.time()
    compiled, _, labels = _chain_setup(L, light=True)
    fs = FullSpaceOp(compiled, labels)
    n = labels.size

    # exact sector-nnz count: diagonal + per-pass in-sector source states
    # with nonzero amplitude (each contributes one matrix entry)
    def count_nnz():
        N = fs.N
        lab = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
        total = jnp.asarray(0, dtype=jnp.int64)
        m = fs.mask
        for dl, slots, jstr, col, wmask, dims in fs._passes:
            c = jnp.zeros(N, dtype=jnp.int32)
            for i, s in enumerate(slots):
                stride = int(fs.space.strides[s])
                d = int(dims[i])
                c = c + ((lab // np.int32(stride)) % np.int32(d)) \
                    * np.int32(int(jstr[i]))
            hit = jnp.zeros(N, dtype=bool)
            for ci in np.nonzero(np.abs(col) > 1e-14)[0]:
                hit = hit | (c == np.int32(int(ci)))
            total = total + jnp.sum(jnp.where(hit, m, 0.0)).astype(jnp.int64)
        return total

    nnz = int(jax.jit(count_nnz)()) + n  # + diagonal
    re, _ = vec_randomize(fs.N, seed=1)
    x = jnp.asarray(re * np.asarray(fs.mask))
    params = fs.params

    fn = jax.jit(lambda p, v: fs.apply(p, (v, None))[0])
    y = fn(params, x)
    jax.block_until_ready(y)  # compile + warm-up
    t_setup = time.time() - t0

    # timed: chained applies (like a Lanczos inner loop)
    iters = 50
    t1 = time.time()
    v = x
    for _ in range(iters):
        v = fn(params, v)
    jax.block_until_ready(v)
    dt = (time.time() - t1) / iters

    nnz_per_s = nnz / dt
    out = {
        "metric": "spmv_nnz_per_s",
        "value": round(nnz_per_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(nnz_per_s / _NOMINAL, 4),
        "detail": {
            "workload": f"heisenberg_chain_L{L}_Sz0",
            "engine": "fullspace_rolls",
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
