"""Collect benchmark/flagship artifacts into BASELINE.json.published + RESULTS.md.

Reads (whichever exist at the repo root):
- FLAGSHIP_kagome24.json  (north-star config #4)
- HUBBARD4x4.json         (config #3)
- SQW_triangular31_tJ.json (config #5)
- BENCH_r*.json           (chip SpMV bench history)
- SCALING_cpu8.json       (sharded-Lanczos device sweep)

Run:  python benchmarks/publish_results.py
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    p = os.path.join(ROOT, name)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def main():
    flagship = _load("FLAGSHIP_kagome24.json")
    flagship_partial = (None if flagship
                        else _load("FLAGSHIP_kagome24.json.partial"))
    hubbard = _load("HUBBARD4x4.json")
    sqw = _load("SQW_triangular31_tJ.json")
    scaling = _load("SCALING_cpu8.json")
    benches = []
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        with open(p) as f:
            benches.append((os.path.basename(p), json.load(f)))

    published = {}
    if flagship:
        published["kagome24_momentum_sectors"] = {
            "dim_full": flagship["dim_full"],
            "E0_full": flagship["E0_full"],
            "E0_per_site": flagship["e0_per_site"],
            "sum_sector_dims_equals_full": flagship["checks"]["sum_dims"],
            "E0_k0_matches_full_1e-10":
                flagship["checks"]["k0_matches_full_1e-10"],
            "min_k_matches_full_1e-10":
                flagship["checks"]["min_k_matches_full_1e-10"],
            "backend": flagship["backend"],
            "timings_s": flagship["timings_s"],
        }
    if flagship_partial:
        published["kagome24_full_sector_partial"] = {
            k: flagship_partial[k]
            for k in ("status", "dim_full", "E0_full_best", "residual_norm",
                      "eigenvalue_error_estimate_quadratic", "e0_per_site",
                      "backend") if k in flagship_partial}
    if hubbard:
        published["fermi_hubbard_4x4"] = {
            "label_space": hubbard["label_space"],
            "dim": hubbard["dim"],
            "index_mode": hubbard["index_mode"],
            "lanczos_iters_per_s": hubbard["lanczos"]["iters_per_s"],
            "E0_ritz_bound": hubbard["lanczos"]["E0_ritz"],
            "devices": hubbard["devices"],
            "backend": hubbard["backend"],
        }
    if sqw:
        published["triangular31_tJ_sqw_kpm"] = {
            k: sqw[k] for k in ("workload", "n_sites", "dim", "n_moments",
                                "backend") if k in sqw}
    if benches:
        name, last = benches[-1]
        published["spmv_bench"] = {
            "artifact": name,
            "nnz_per_s": last["parsed"]["value"],
            "vs_nominal_1e9": last["parsed"]["vs_baseline"],
            "detail": last["parsed"]["detail"],
        }
    if scaling:
        published["scaling_virtual8"] = {
            "results": scaling["results"], "caveat": scaling["caveat"]}

    base = _load("BASELINE.json") or {}
    base["published"] = published
    with open(os.path.join(ROOT, "BASELINE.json"), "w") as f:
        json.dump(base, f, indent=2)

    # ---------------- RESULTS.md
    lines = ["# RESULTS — measured artifacts", ""]
    if flagship:
        t = flagship["timings_s"]
        lines += [
            "## North star: 24-site kagome Heisenberg, momentum sectors "
            "(BASELINE config #4)", "",
            f"- backend: **{flagship['backend']}** (single v5e chip)",
            f"- full Sz=0 sector dim **{flagship['dim_full']:,}** "
            f"(label space 2^24), E0 = **{flagship['E0_full']:.12f}** "
            f"({flagship['e0_per_site']:.6f}/site)",
            "- momentum sectors solved independently via the projected "
            "full-space engine (P_k as roll/transpose translations):", "",
            "| k | dim | E0 | solve s |", "|---|---|---|---|",
        ]
        for s in flagship["sectors"]:
            lines.append(f"| ({s['k'][0]},{s['k'][1]}) | {s['dim']:,} | "
                         f"{s['E0']:.12f} | {s['solve_s']} |")
        ck = flagship["checks"]
        lines += [
            "",
            f"- sum of sector dims == full dim: **{ck['sum_dims']}**",
            f"- min_k E0(k) == E0(full) to 1e-10: "
            f"**{ck['min_k_matches_full_1e-10']}** (two independent "
            "algorithms: full-sector solve vs momentum-projected sector "
            f"solves); ground state at k={tuple(ck['gs_momentum'])}",
            f"- E0(k=0) == E0(full): {ck['k0_matches_full_1e-10']} "
            "(the GS momentum is a result, not an assumption — see "
            "gs_momentum)",
            f"- wall: enumerate {t['enumerate_full']}s, full solve "
            f"{t['solve_full']}s, total {t['total']}s", "",
        ]
    if flagship_partial:
        fp = flagship_partial
        lines += [
            "## North star (partial): 24-site kagome Heisenberg full "
            "sector on TPU", "",
            f"- E0(full Sz=0, dim {fp['dim_full']:,}) = "
            f"**{fp['E0_full_best']:.12f}** "
            f"({fp['e0_per_site']:.6f}/site) on {fp['backend']}",
            f"- Lanczos residual {fp['residual_norm']:.2e} "
            "(rigorous eigenvalue error bound); quadratic estimate "
            f"{fp['eigenvalue_error_estimate_quadratic']:.1e}",
            f"- status: {fp['status']}", "",
        ]
    if hubbard:
        lz = hubbard["lanczos"]
        lines += [
            "## Fermi-Hubbard 4x4 half filling (config #3)", "",
            f"- label space 4^16 = {hubbard['label_space']:,}; "
            f"sector dim **{hubbard['dim']:,}** (= C(16,8)^2), enumerated "
            "combinatorially in "
            f"{hubbard['timings_s']['enumerate']}s",
            f"- generalized Lin-table index over the 8+8 sublattice split "
            f"({hubbard['index_mode']}) built in "
            f"{hubbard['timings_s']['lin_table']}s",
            f"- sharded matrix-free Lanczos over {hubbard['devices']} "
            f"devices ({hubbard['backend']}): "
            f"{lz['matvecs']} matvecs at {lz['iters_per_s']} iter/s; "
            f"Ritz bound E0 <= {lz['E0_ritz']:.6f} "
            f"(residual {lz['residual_bound']:.2e} — demonstration-depth "
            "run; the artifact records how far E0 got)", "",
        ]
    if benches:
        lines += ["## Chip SpMV bench (bench.py, L=24 chain Sz=0)", ""]
        for name, b in benches:
            d = b["parsed"]["detail"]
            lines.append(f"- {name}: **{b['parsed']['value']:.3g} nnz/s** "
                         f"({d['engine']}, {d['ms_per_apply']} ms/apply, "
                         f"setup {d['setup_s']}s, {d['backend']})")
        lines.append("")
    if sqw:
        lines += [
            "## KPM dynamical structure factor, 31-site tilted triangular "
            "t-J (config #5)", "",
            f"- artifact: SQW_triangular31_tJ.json / .png "
            f"({sqw.get('n_moments', '?')} Chebyshev moments)", "",
        ]
    if scaling:
        lines += [
            "## Sharded-Lanczos device sweep (virtual 8-dev CPU mesh)", "",
            "| devices | iters/s | ms/iter |", "|---|---|---|",
        ]
        for r in scaling["results"]:
            if r.get("metric") == "lanczos_iters_per_s":
                lines.append(f"| {r['devices']} | {r['value']} | "
                             f"{r['detail']['ms_per_iter']} |")
        halo = [r for r in scaling["results"]
                if r.get("metric") == "halo_spmv_nnz_per_s"]
        for r in halo:
            lines += ["", f"- halo-exchange ELL SpMV at {r['devices']} "
                          f"devices: {r['value']:.3g} nnz/s "
                          f"({r['detail']['ms_per_apply']} ms/apply, "
                          "traffic vs all-gather "
                          f"{r['detail']['halo_traffic_ratio_vs_allgather']})"]
        lines += ["", f"caveat: {scaling['caveat']}", ""]

    with open(os.path.join(ROOT, "RESULTS.md"), "w") as f:
        f.write("\n".join(lines))
    print("published sections:", sorted(published.keys()))


if __name__ == "__main__":
    main()
