"""Fermi-Hubbard 4x4 at half filling — the 2^32-label-space workload.

BASELINE config #3 (reference driver:
examples/trans_absent/latt_square/square_Fermi_Hubbard.cc scaled from 4x2 to
4x4): U=1.1, N_up = N_dn = 8, label space 4^16 = 2^32, sector dim
C(16,8)^2 = 165,636,900.

Pipeline demonstrated end to end:
1. combinatorial meet-in-the-middle sector enumeration
   (basis/enumerate.py:enumerate_basis_dnc) — the chunked d^N scan is
   hopeless at 2^32;
2. generalized Lin-table indexing over the 8+8-site sublattice split
   (Ja[label % 4^8] + Jb[label // 4^8], cf. fill_Lin_table,
   reference src/basis.cc:1193-1348) — two O(1) gathers per image lookup
   where binary search would pay log2(1.66e8) = 28 probes;
3. matrix-free Lanczos iterations with basis rows sharded over a device
   mesh (parallel/apply_sharded.py), measured iterations/second.

By default runs a bounded number of Lanczos cycles and reports how far the
Ritz value got (the residual bound |theta - E0| <= ||r|| quantifies it);
pass --inner/--cycles to push further. Writes HUBBARD4x4.json.

Run (8 virtual CPU devices):
    python benchmarks/hubbard4x4.py --devices 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--platform", default="cpu",
                    help="cpu (virtual mesh) or leave the default backend")
    ap.add_argument("--inner", type=int, default=12,
                    help="Lanczos steps per fused cycle")
    ap.add_argument("--cycles", type=int, default=1)
    ap.add_argument("--block-rows", type=int, default=1 << 19)
    ap.add_argument("--out", default="HUBBARD4x4.json")
    args = ap.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "examples"))
    from square_fermi_hubbard import build

    from quantum_basis_tpu import initialize
    from quantum_basis_tpu.basis.enumerate import enumerate_basis_dnc
    from quantum_basis_tpu.basis.index import BasisIndex
    from quantum_basis_tpu.basis.lin_table import digit_split
    from quantum_basis_tpu.ops.apply import DeviceBasis
    from quantum_basis_tpu.parallel import MatvecSharded, basis_mesh
    from quantum_basis_tpu.solvers.lanczos import lanczos_ground
    from quantum_basis_tpu.utils.rng import vec_randomize

    initialize(quiet=True)
    t_all = time.time()
    m, lat, Nup, Ndn = build(4, 4)
    space = m.space
    print(f"label space 4^16 = {space.label_space}", flush=True)

    # 1. combinatorial enumeration
    t0 = time.time()
    labels = enumerate_basis_dnc(space, [Nup, Ndn], [8.0, 8.0])
    t_enum = time.time() - t0
    assert labels is not None
    dim = int(labels.size)
    print(f"sector dim = {dim}  (enumerate {t_enum:.1f}s)", flush=True)
    assert dim == 165_636_900, dim

    # 2. Lin-table index over the sublattice split
    t0 = time.time()
    split = digit_split(space)
    index = BasisIndex(labels, space.label_space, mode="lin", lin_split=split)
    t_lin = time.time() - t0
    print(f"index mode = {index.mode} (split {split})  [{t_lin:.1f}s]",
          flush=True)

    # 3. device residency + sharded matrix-free Lanczos
    t0 = time.time()
    compiled = m.compiled_Ham
    dbasis = DeviceBasis(space, labels, index=index,
                         block_rows=args.block_rows)
    mesh = basis_mesh(args.devices if args.platform == "cpu"
                      else len(jax.devices()))
    mv = MatvecSharded(compiled, dbasis, mesh)
    t_build = time.time() - t0
    print(f"device residency + sharded matvec build: {t_build:.1f}s "
          f"({dbasis.n_blocks} blocks x {dbasis.block_rows} rows, "
          f"mesh {mesh.shape})", flush=True)

    re, _ = vec_randomize(dim, seed=1)
    v0 = mv.pad((jnp.asarray(re), None))

    t0 = time.time()
    out = lanczos_ground(mv, v0, maxit=args.cycles * (2 * args.inner + 1),
                         inner=args.inner, want_vector=False)
    t_solve = time.time() - t0
    iters = out["niter"]
    print(f"{iters} Lanczos matvecs in {t_solve:.1f}s "
          f"({iters / t_solve:.3f} iters/s)", flush=True)
    print(f"Ritz E0 estimate = {out['E0']:.9f}  "
          f"(|theta - E0| <= residual = {out['residual']:.2e})", flush=True)

    rec = {
        "workload": "fermi_hubbard_4x4_halffilling_U1.1",
        "label_space": int(space.label_space),
        "dim": dim,
        "devices": int(np.prod(list(mesh.shape.values()))),
        "backend": jax.devices()[0].platform,
        "index_mode": index.mode,
        "timings_s": {"enumerate": round(t_enum, 1),
                      "lin_table": round(t_lin, 1),
                      "residency": round(t_build, 1),
                      "solve": round(t_solve, 1),
                      "total": round(time.time() - t_all, 1)},
        "lanczos": {"matvecs": int(iters),
                    "iters_per_s": round(iters / t_solve, 4),
                    "E0_ritz": float(out["E0"]),
                    "residual_bound": float(out["residual"])},
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
