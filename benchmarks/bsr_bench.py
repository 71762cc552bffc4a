"""Pallas BSR SpMV vs gather-ELL, compiled on the chip (BSR_BENCH.json).

Measures both explicit-sparse engines on real momentum-sector matrices
(the workload class Model._repr_spmv routes): per-apply wall time via a
fori_loop of chained applies (one dispatch, amortizing tunnel latency),
plus an ON-CHIP agreement check between the two engines — the round-3
uninitialized-tile bug was invisible in interpret mode, so compiled
execution is the only evidence that matters.

The recorded rates calibrate config.bsr_blowup_max: BSR streams
``stored = blowup * nnz`` values at HBM bandwidth while ELL pays one
random gather per stored value; BSR wins while
``blowup < ell_cost_per_nnz * HBM_rate``.

Run (real chip):  python benchmarks/bsr_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time


def bench_apply(apply, params, x, reps=64):
    import jax
    from jax import lax

    def chain(x):
        def body(i, v):
            re, im = apply(params, v)
            return (re, im)

        return lax.fori_loop(0, reps, body, x)

    f = jax.jit(chain)
    y = f(x)
    jax.block_until_ready(y[0])
    t0 = time.time()
    y = f(x)
    jax.block_until_ready(y[0])
    return (time.time() - t0) / reps, y


def main():
    import argparse

    apr = argparse.ArgumentParser()
    apr.add_argument("--reps", type=int, default=64)
    apr.add_argument("--cases", default="chain16_k0,chain20_k0,kagome_tj22_k0")
    apr.add_argument("--out", default="BSR_BENCH.json")
    args = apr.parse_args()

    os.environ.setdefault(
        "QBX_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".xla_cache"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from models_zoo import heisenberg_chain, kagome_tj

    from quantum_basis_tpu import initialize
    from quantum_basis_tpu.ops.pallas_bsr import bsr_fill_stats, ell_to_bsr
    from quantum_basis_tpu.utils.rng import vec_randomize

    initialize(quiet=True)
    backend = jax.devices()[0].platform
    print("backend:", backend, flush=True)

    cases = []

    def add_case(tag, m, k, conserve, vals):
        m.enumerate_basis_repr(k, conserve, vals)
        s = m.sec_repr[0]
        cases.append((tag, m._repr_ell(s)))

    want = set(args.cases.split(","))
    if "chain16_k0" in want:
        m, ops = heisenberg_chain(16)
        add_case("chain16_k0", m, [0], [ops["Sz"]], [0.0])
    if "chain20_k0" in want:
        m, ops = heisenberg_chain(20)
        add_case("chain20_k0", m, [0], [ops["Sz"]], [0.0])
    if "kagome_tj22_k0" in want:
        m, ops = kagome_tj(2, 2)
        add_case("kagome_tj22_k0", m, [0, 0], [ops["Sz"], ops["N"]],
                 [0.0, 8.0])

    out = {"backend": backend, "cases": []}
    for tag, ell in cases:
        st = bsr_fill_stats(ell)
        n = ell.n
        nnz_true = st["nnz"] + n  # + diagonal
        re, im = vec_randomize(n, seed=3, complex_valued=True)
        x = (jnp.asarray(re), jnp.asarray(im))

        t_ell, y_ell = bench_apply(ell.apply, ell.params, x, args.reps)
        # Mosaic has no f64: the compiled kernel runs f32 — the bulk-
        # Krylov precision tier (f64 polish stays on the XLA ELL apply,
        # the framework's standard precision split)
        dt_bsr = np.float32 if backend == "tpu" else None
        bsr = ell_to_bsr(ell, interpret=(backend != "tpu"), dtype=dt_bsr)
        xb = (jnp.asarray(re, bsr.dtype), jnp.asarray(im, bsr.dtype))
        t_bsr, y_bsr = bench_apply(bsr.apply, bsr.params, xb, args.reps)
        # chained-apply outputs diverge exponentially; agreement is checked
        # on ONE application instead (f32 kernel => f32 tolerance)
        y1 = ell((jnp.asarray(re), jnp.asarray(im)))
        y2 = bsr((jnp.asarray(re), jnp.asarray(im)))
        scale = float(jnp.max(jnp.abs(y1[0]))) + float(jnp.max(jnp.abs(y1[1])))
        dmax = max(float(jnp.max(jnp.abs(y1[0] - jnp.asarray(y2[0], jnp.float64)))),
                   float(jnp.max(jnp.abs(y1[1] - jnp.asarray(y2[1], jnp.float64))))) / max(scale, 1e-30)
        rec = {
            "workload": tag, "dim": n, "nnz": nnz_true,
            "blowup": round(st["blowup"], 1),
            "n_blocks": st["n_blocks"],
            "ell_us_per_apply": round(t_ell * 1e6, 1),
            "bsr_us_per_apply": round(t_bsr * 1e6, 1),
            "ell_nnz_per_s": round(nnz_true / t_ell, 1),
            "bsr_nnz_per_s": round(nnz_true / t_bsr, 1),
            "bsr_stored_vals_per_s": round(
                (st["stored"] + n) / t_bsr, 1),
            "bsr_dtype": str(np.dtype(dt_bsr or np.float64)),
            "agree_max_rel_diff": dmax,
            "winner": "bsr" if t_bsr < t_ell else "ell",
        }
        print(json.dumps(rec), flush=True)
        out["cases"].append(rec)

    # calibrated routing threshold: blowup at which BSR streaming equals
    # the measured ELL gather rate
    rates = [(c["bsr_stored_vals_per_s"], c["ell_nnz_per_s"])
             for c in out["cases"]]
    if rates:
        stream = max(r[0] for r in rates)
        gather = max(r[1] for r in rates)
        out["calibration"] = {
            "bsr_stream_vals_per_s": stream,
            "ell_gather_nnz_per_s": gather,
            "breakeven_blowup": round(stream / gather, 1),
        }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out.get("calibration", {})))


if __name__ == "__main__":
    main()
