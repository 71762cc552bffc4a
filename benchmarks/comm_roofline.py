"""Communication roofline for the multi-device engines (SCALING artifact).

Until real ≥2-chip hardware is available, the >80%-scaling-at-2-hosts
claim needs a MODEL, not a virtual-device measurement (virtual CPU devices
share one socket and measure partitioning overhead only). This tool builds
that model: for each engine it combines

- measured single-chip compute time per apply (driver-captured bench
  numbers / HUBBARD4x4.json when present),
- analytic bytes-moved-per-apply under its sharding strategy (halo
  all-to-all capacities measured from the real ELL; all-gather and
  GSPMD-transpose volumes in closed form),
- nominal interconnect bandwidths (TPU v5e ICI ~9e10 B/s per device
  one-way; DCN ~6.25e9 B/s per host = 50 Gbps),

into predicted efficiency eff(P) = t_compute / (t_compute + t_comm)
(no-overlap, pessimistic) and max(t_comp, t_comm) (perfect overlap).
Appends a ``scaling_model`` section to SCALING_cpu8.json.

Run on CPU (the halo capacities come from host-side ELL analysis):
    JAX_PLATFORMS=cpu python benchmarks/comm_roofline.py
"""

from __future__ import annotations

import json
import os
import sys

ICI_BW = 9.0e10   # bytes/s one-way per device (v5e 2-D torus, per scaling-book-class numbers)
DCN_BW = 6.25e9   # bytes/s per host (50 Gbps)


def eff(t_comp_s, bytes_per_dev, bw):
    t_comm = bytes_per_dev / bw
    return {
        "t_compute_ms": round(t_comp_s * 1e3, 3),
        "t_comm_ms": round(t_comm * 1e3, 3),
        "efficiency_no_overlap": round(t_comp_s / (t_comp_s + t_comm), 3),
        "efficiency_overlapped": round(
            t_comp_s / max(t_comp_s, t_comm), 3),
    }


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    import numpy as np

    model = {"assumptions": {
        "ici_bytes_per_s_per_device_oneway": ICI_BW,
        "dcn_bytes_per_s_per_host": DCN_BW,
        "note": "eff = t_comp/(t_comp+t_comm) with measured single-chip "
                "t_comp scaled as t/P; no-overlap is the pessimistic "
                "bound, overlapped assumes comm hidden behind compute.",
    }, "engines": []}

    # ---- 1. factorized product engine (Fermi-Hubbard 4x4 flagship) ----
    # comm per apply: one reduction of the (na, nb) f32 state matrix for
    # the A @ psi contraction over the sharded row axis
    # (reduce-scatter: n*(P-1)/P bytes per device); psi@A^T + diagonal local.
    t1 = 0.2986  # measured f32 apply s/chip (HUBBARD4x4.json overrides)
    try:
        with open("HUBBARD4x4.json") as f:
            t1 = json.load(f)["f32_apply_ms"] / 1e3
    except Exception:
        pass
    n_bytes = 12870 * 12870 * 4
    for P, bw, net in ((2, ICI_BW, "ici"), (8, ICI_BW, "ici"),
                       (2, DCN_BW, "dcn_2hosts")):
        model["engines"].append({
            "engine": "kron_product (hubbard 4x4, f32 dense MXU)",
            "devices": P, "network": net,
            "bytes_per_device_per_apply": int(n_bytes * (P - 1) / P / P),
            **eff(t1 / P, n_bytes * (P - 1) / P / P, bw)})

    # ---- 2. contract-window full-space engine (kagome-24 flagship) ----
    # comm per apply: 2 frame transposes of the N=2^24 f32 full-space
    # vector = 2 all-to-alls moving n*(P-1)/P^2 bytes per device each
    t2 = 6.64e-3  # BENCH_r04 measured ms/apply on the chip
    n2 = (1 << 24) * 4
    for P, bw, net in ((2, ICI_BW, "ici"), (8, ICI_BW, "ici"),
                       (2, DCN_BW, "dcn_2hosts")):
        b = 2 * n2 * (P - 1) / P / P
        model["engines"].append({
            "engine": "contract_windows (kagome-24 full space, f32)",
            "devices": P, "network": net,
            "bytes_per_device_per_apply": int(b),
            **eff(t2 / P, b, bw)})

    # ---- 3. halo all-to-all ELL (measured halo capacity, chain-18) ----
    from models_zoo import heisenberg_chain

    from quantum_basis_tpu.ops.sparse import build_sparse_full
    from quantum_basis_tpu.parallel import EllShardedHalo, basis_mesh

    m, ops = heisenberg_chain(18)
    m.enumerate_basis_full([ops["Sz"]], [0.0])
    ell = build_sparse_full(m.sec_full[0].matvec)
    mesh = basis_mesh(8)
    halo = EllShardedHalo(ell, mesh)
    st = halo.halo_stats()
    # measured single-chip gather-ELL rate from the r04 chip bench class:
    # ~5.5e9 nnz/s -> t_comp = nnz / rate
    rate = 5.5e9
    t3 = ell.nnz / rate
    for P, bw, net in ((8, ICI_BW, "ici"), (2, DCN_BW, "dcn_2hosts")):
        b = st["pair_capacity"] * (P - 1) * 8  # f64 halo entries sent/dev
        model["engines"].append({
            "engine": "ell_halo_a2a (chain-18 Sz=0, measured halo)",
            "devices": P, "network": net,
            "halo_stats": {k: (round(v, 4) if isinstance(v, float) else v)
                           for k, v in st.items()},
            "bytes_per_device_per_apply": int(b),
            **eff(t3 / P, b, bw)})

    # ---- 4. all-gather fallback (same matrix) for contrast ----
    n3 = ell.n * 8
    P = 8
    b = n3 * (P - 1) / P
    model["engines"].append({
        "engine": "matvec_allgather (chain-18, contrast)",
        "devices": P, "network": "ici",
        "bytes_per_device_per_apply": int(b),
        **eff(t3 / P, b, ICI_BW)})

    path = "SCALING_cpu8.json"
    with open(path) as f:
        art = json.load(f)
    art["scaling_model"] = model
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(model, indent=1))


if __name__ == "__main__":
    main()
