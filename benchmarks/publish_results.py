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
    sqw24 = _load("SQW_kagome24.json")
    bsr = _load("BSR_BENCH.json")
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
    if hubbard and hubbard.get("status") == "converged":
        published["fermi_hubbard_4x4"] = {
            "status": "converged",
            "dim": hubbard["dim"],
            "E0": hubbard["E0"],
            "residual_f64": hubbard["residual_f64"],
            "residual_gate": hubbard["residual_gate"],
            "gate_passed": hubbard["gate_passed"],
            "formulation": hubbard["formulation"],
            "f32_apply_ms": hubbard["f32_apply_ms"],
            "golden_4x2_ok": hubbard["golden_4x2"]["ok"],
            "backend": hubbard["backend"],
            "timings_s": hubbard["timings_s"],
        }
    elif hubbard:
        published["fermi_hubbard_4x4"] = {
            "status": "pipeline-demo",
            "dim": hubbard["dim"],
            "E0_ritz_bound": hubbard["lanczos"]["E0_ritz"],
            "backend": hubbard["backend"],
        }
    gaps = _load("HUBBARD4x4_GAPS.json")
    if gaps is None:
        part = _load("HUBBARD4x4_GAPS.json.partial")
        # the .partial file is the bare per-sector dict
        gaps = {"sectors": part, "status": "partial"} if part else None
    if gaps and gaps.get("sectors"):
        published["fermi_hubbard_4x4_gaps"] = {
            "sectors": {k: {kk: s[kk] for kk in
                            ("Nup", "Ndn", "dim", "E0", "residual_f64")
                            if kk in s}
                        for k, s in gaps["sectors"].items()},
            "spin_gap": gaps.get("spin_gap"),
            "charge_gap": gaps.get("charge_gap"),
            "backend": gaps.get("backend"),
        }
    if sqw24:
        published["kagome24_sqw_kpm"] = {
            k: sqw24[k] for k in ("workload", "n_sites", "dim_k0", "k0",
                                  "E0", "n_moments", "engine", "backend",
                                  "sum_rule") if k in sqw24}
    if bsr:
        published["pallas_bsr_bench"] = {
            "backend": bsr["backend"],
            "cases": [{k: c[k] for k in ("workload", "dim", "blowup",
                                         "ell_us_per_apply",
                                         "bsr_us_per_apply", "winner")}
                      for c in bsr["cases"]],
            "calibration": bsr.get("calibration"),
            "golden_sector_on_chip": bsr.get("golden_sector_on_chip"),
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
            f"{t['solve_full']}s, total {t['total']}s",
            "- timing caveat: walls are from the FINAL watchdog attempt, "
            "which warm-resumed from checkpoints — a near-zero solve "
            "wall is the checkpoint-load time of an already-converged "
            "stage; per-sector solve_s values share the caveat. "
            "Cumulative wall across attempts is larger.", "",
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
    if hubbard and hubbard.get("status") == "converged":
        t = hubbard["timings_s"]
        g = hubbard["golden_4x2"]
        lines += [
            "## Fermi-Hubbard 4x4 half filling CONVERGED (config #3)", "",
            f"- sector dim **{hubbard['dim']:,}** (= C(16,8)^2), "
            f"**E0 = {hubbard['E0']:.12f}** on a single "
            f"{hubbard['backend']} chip",
            f"- exact f64 residual ||Hx - E0 x|| = "
            f"**{hubbard['residual_f64']:.3e}** < gate "
            f"{hubbard['residual_gate']:.3e} — "
            f"gate {'PASSED' if hubbard['gate_passed'] else 'FAILED'}",
            f"- formulation: {hubbard['formulation']} — the 1.66e8-dim "
            "state vector is a (12870, 12870) matrix; one H apply = two "
            "dense 12870^3 MXU matmuls + an elementwise coupling pass "
            f"({hubbard['f32_apply_ms']} ms f32 = "
            f"{hubbard['stored_nnz_per_s']:.3g} stored-nnz/s)",
            f"- wall (fresh, incl. compiles): f32 bulk "
            f"{t.get('f32_stage_s', '?')}s + f64 RQI polish "
            f"{t.get('polish_s', '?')}s = solve {t['solve']}s "
            f"(total {t['total']}s); factor build {t['factor_build']}s "
            "(the r04 row-gather formulation needed 869 s of setup and "
            "managed 0.012 iter/s)",
            f"- 4x2 golden cross-check through the same ProductModel "
            f"path: E0 = {g['E0']:.9f} vs ref {g['ref']} "
            f"[{'OK' if g['ok'] else 'FAIL'}], fresh on chip "
            f"{g['wall_s']}s", "",
        ]
    if gaps and gaps.get("sectors"):
        lines += ["## Fermi-Hubbard 4x4 spin/charge gap sectors", ""]
        for k, s in gaps["sectors"].items():
            r = s.get("residual_f64")
            rtxt = f"resid {r:.2e}" if r is not None else "resumed"
            lines.append(
                f"- E0({s['Nup']},{s['Ndn']}) = {s['E0']:.12f} "
                f"(dim {s['dim']:,}, {rtxt})"
                + (f" [{s['source']}]" if s.get("source") else ""))
        if gaps.get("spin_gap") is not None:
            lines.append(f"- spin gap Delta_s = {gaps['spin_gap']:.9f}; "
                         f"charge gap Delta_c = {gaps['charge_gap']:.9f}")
        lines.append("")
    if benches:
        lines += ["## Chip SpMV bench (bench.py, L=24 chain Sz=0)", ""]
        for name, b in benches:
            d = b["parsed"]["detail"]
            lines.append(f"- {name}: **{b['parsed']['value']:.3g} nnz/s** "
                         f"({d['engine']}, {d['ms_per_apply']} ms/apply, "
                         f"setup {d['setup_s']}s, {d['backend']})")
        lines.append("")
    if sqw24:
        sr = sqw24.get("sum_rule", {})
        lines += [
            "## Momentum-resolved S(q,w), kagome-24 (flagship dynamics)",
            "",
            f"- artifact: SQW_kagome24.json / .png — all "
            f"{len(sqw24.get('runs', []))} q on the 2x4 BZ grid, "
            f"{sqw24.get('n_moments')} Chebyshev moments each, GS sector "
            f"k0={tuple(sqw24.get('k0', ()))} (dim "
            f"{sqw24.get('dim_k0', 0):,}) on {sqw24.get('backend')}",
            f"- engine: {sqw24.get('engine')} — A_q|gs> lands in sector "
            "k0-q; moments recorded on the projected full-space engine "
            "(dual-path-tested vs the per-row repr kernel)",
            f"- sum rule: sum_q integral S(q,w) dw = "
            f"{sr.get('integral', 0):.6f} vs sum_q ||A_q|gs>||^2 = "
            f"{sr.get('norms2', 0):.6f}", "",
        ]
    if bsr:
        lines += [
            "## Pallas BSR SpMV compiled on chip (BSR_BENCH.json)", "",
        ]
        for c in bsr["cases"]:
            lines.append(
                f"- {c['workload']} (dim {c['dim']:,}, blowup "
                f"{c['blowup']}): BSR {c['bsr_us_per_apply']}us vs ELL "
                f"{c['ell_us_per_apply']}us per apply -> "
                f"**{c['winner']}** (agree "
                f"{c['agree_max_rel_diff']:.1e})")
        cal = bsr.get("calibration") or {}
        if cal:
            lines.append(
                f"- calibration: BSR streams "
                f"{cal['bsr_stream_vals_per_s']:.3g} stored-vals/s vs "
                f"gather ELL {cal['ell_gather_nnz_per_s']:.3g} nnz/s -> "
                f"measured break-even blowup "
                f"{cal['breakeven_blowup']} (routing threshold "
                "config.bsr_blowup_max = 400)")
        gs = bsr.get("golden_sector_on_chip")
        if gs:
            lines.append(
                f"- golden sector on chip via the mixed BSR route "
                f"({gs['route']}): {gs['workload']} E0 = {gs['E0']:.9f} "
                f"vs golden {gs['golden']} in {gs['wall_s']}s")
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
        sm = scaling.get("scaling_model")
        if sm:
            lines += [
                "### Communication roofline (model behind the multi-host "
                "claim)", "",
                "Real >=2-chip hardware is unavailable, so the artifact "
                "carries a `scaling_model` section "
                "(benchmarks/comm_roofline.py): per engine, analytic "
                "bytes-per-apply under its sharding strategy against "
                "nominal ICI (9e10 B/s/device) / DCN (50 Gbps/host) "
                "bandwidths, combined with measured single-chip apply "
                "times. Predicted no-overlap efficiencies:", "",
            ]
            for e in sm["engines"]:
                lines.append(
                    f"- {e['engine']} @{e['devices']} ({e['network']}): "
                    f"eff {e['efficiency_no_overlap']} "
                    f"(overlapped {e['efficiency_overlapped']})")
            lines += ["", "The contract-window engine's two full-vector "
                      "frame transposes are DCN-bound across hosts — "
                      "which is why the factorized product engine and the "
                      "halo ELL engine carry the multi-host story.", ""]

    with open(os.path.join(ROOT, "RESULTS.md"), "w") as f:
        f.write("\n".join(lines))
    print("published sections:", sorted(published.keys()))


if __name__ == "__main__":
    main()
