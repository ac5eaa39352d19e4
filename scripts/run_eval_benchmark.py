"""Benchmark-scale end-to-end evaluation of the imported volpick weights.

Runs the FULL reference evaluation protocol (reference
`volpick/model/eval_taks0.py:370-825`, `eval_taks123.py:20-192`) at benchmark
scale on a >=5k-trace synthetic LP+VT+noise dataset, for both imported models:

    targets (task0/1/23) -> task0 threshold sweep 0.1..0.9 -> TNR ->
    dev-F1-optimal thresholds (opt_prob_metrics) -> task123 ->
    collect_task0_results / collect_task123_results

and writes the metric tables + wall times to docs/EVAL.md. The real VCSEIS
benchmark cannot be downloaded in this environment (zero egress); this is the
strongest available demonstration that the L5 eval layer works at scale, not
just at unit-test scale.

Usage (TPU or CPU; TPU recommended):
    timeout 5400 python -u scripts/run_eval_benchmark.py [--quick]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
import pandas as pd


def fmt_table(df: pd.DataFrame, floatfmt: str = "{:.4f}") -> str:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].map(lambda v: floatfmt.format(v) if v == v else "nan")
    cols = list(df.columns)
    lines = ["| " + " | ".join(str(c) for c in cols) + " |",
             "|" + "|".join("---" for _ in cols) + "|"]
    for _, row in df.iterrows():
        lines.append("| " + " | ".join(str(row[c]) for c in cols) + " |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="300-trace smoke variant")
    ap.add_argument("--easy", action="store_true",
                    help="legacy clean-sinusoid dataset (saturates at F1~1.0; "
                         "kept for comparison only — quality claims use the "
                         "hard graded-SNR benchmark, the default)")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()
    if args.data_dir is None:
        args.data_dir = "/tmp/volpick_eval_benchmark" if args.easy else "/tmp/volpick_hard_benchmark"
    if args.out_dir is None:
        args.out_dir = "/tmp/volpick_eval_out" if args.easy else "/tmp/volpick_hard_eval_out"

    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    import jax

    from volpick_tpu.data.dataset import load_dataset
    from volpick_tpu.data.synthetic import make_hard_synthetic_dataset, make_synthetic_dataset
    from volpick_tpu.eval.analysis import performance_vs_snr_fi
    from volpick_tpu.eval.targets import generate_task0, generate_task1, generate_task23
    from volpick_tpu.eval.task0 import (
        collect_task0_results,
        eval_task0,
        eval_task0_true_negative_rate,
        opt_prob_metrics,
    )
    from volpick_tpu.eval.task123 import (
        collect_task123_results,
        eval_tasks123,
        parse_task1,
        parse_task23,
    )
    from volpick_tpu.models import from_pretrained

    t_all = time.perf_counter()
    n_events, n_noise = (250, 50) if args.quick else (4600, 920)
    data_dir = Path(args.data_dir + ("_quick" if args.quick else ""))
    out_base = Path(args.out_dir + ("_quick" if args.quick else ""))
    out_base.mkdir(parents=True, exist_ok=True)

    timings = {}
    t0 = time.perf_counter()
    if not (data_dir / "metadata.csv").exists():
        # 12k-sample traces so task23 isolation windows + 30 s task0/1 windows
        # both have room, like real VCSEIS traces (60-120 s)
        gen = make_synthetic_dataset if args.easy else make_hard_synthetic_dataset
        gen(
            data_dir, n_events=n_events, n_noise=n_noise, n_samples=12001,
            seed=1234, split_prob=(0.6, 0.2, 0.2),
        )
    timings["dataset_build_s"] = round(time.perf_counter() - t0, 1)

    dataset = load_dataset(data_dir)
    dataset.preload_waveforms()
    n_traces = len(dataset)
    print(f"dataset: {n_traces} traces", flush=True)

    targets_dir = out_base / "targets"
    t0 = time.perf_counter()
    generate_task0(dataset, targets_dir, keep_source_type=True)
    generate_task1(dataset, targets_dir)
    generate_task23(dataset, targets_dir)
    timings["targets_s"] = round(time.perf_counter() - t0, 1)

    experiments = []
    exp_stats = {}
    for name in ("phasenet", "eqtransformer"):
        model, params = from_pretrained(
            name, search_paths=["/root/reference/Final_models/volpick"]
        )
        exp = f"{name}_volpick"
        exp_dir = out_base / exp
        # stage-resume: the axon tunnel can flap mid-run (UNAVAILABLE /
        # truncated remote_compile bodies); a rerun skips completed stages
        if not (exp_dir / "test_metrics.csv").exists():
            t0 = time.perf_counter()
            eval_task0(model, params, dataset, targets_dir, exp_dir)
            timings[f"{exp}_task0_sweep_s"] = round(time.perf_counter() - t0, 1)
        if not (exp_dir / "test_tnr.csv").exists():
            t0 = time.perf_counter()
            eval_task0_true_negative_rate(model, params, dataset, targets_dir, exp_dir)
            timings[f"{exp}_tnr_s"] = round(time.perf_counter() - t0, 1)
        if not (exp_dir / "test_task23.csv").exists():
            t0 = time.perf_counter()
            eval_tasks123(model, params, dataset, targets_dir, exp_dir)
            timings[f"{exp}_task123_s"] = round(time.perf_counter() - t0, 1)
        exp_stats[exp] = {
            "opt": opt_prob_metrics(exp_dir),
            "task1": parse_task1(exp_dir),
            "task23": parse_task23(exp_dir),
        }
        # performance vs SNR / FI at the dev-optimal thresholds (the
        # reference's Performance_vs_freq_vs_snr study); needs the measured
        # metadata columns the hard generator writes
        if "trace_mean_snr_db" in dataset.metadata.columns and not args.easy:
            an_dir = exp_dir / "analysis"
            if not (an_dir / "test_p_recall_vs_snr.csv").exists():
                t0 = time.perf_counter()
                opt = exp_stats[exp]["opt"]
                exp_stats[exp]["analysis"] = performance_vs_snr_fi(
                    model, params, dataset, targets_dir, an_dir,
                    set_name="test",
                    prob_threshold=opt.get("p_threshold"),
                    s_threshold=opt.get("s_threshold"),
                    snr_bins=(-10, 0, 3, 6, 10, 15, 20, 30, 60),
                )
                timings[f"{exp}_analysis_s"] = round(time.perf_counter() - t0, 1)
            else:  # resumed run: load the committed-stage CSVs for the report
                exp_stats[exp]["analysis"] = {
                    k: pd.read_csv(an_dir / f"test_{k}.csv")
                    for k in ("p_recall_vs_snr", "s_recall_vs_snr",
                              "p_recall_vs_fi", "s_recall_vs_fi", "recall_vs_type")
                    if (an_dir / f"test_{k}.csv").exists()
                }
        experiments.append(exp)
        print(f"{exp}: done", flush=True)

    coll0 = collect_task0_results(out_base, experiments)
    coll123 = collect_task123_results(out_base, experiments)
    coll0.to_csv(out_base / "collected_task0.csv", index=False)
    coll123.to_csv(out_base / "collected_task123.csv", index=False)
    timings["total_s"] = round(time.perf_counter() - t_all, 1)

    # ---------------------------------------------------------------- report
    backend = jax.default_backend()
    task0_meta = pd.read_csv(targets_dir / "task0.csv")
    lines = [
        "# EVAL — benchmark-scale end-to-end evaluation artifact",
        "",
        f"Generated by `python scripts/run_eval_benchmark.py` on backend "
        f"`{backend}` ({jax.devices()[0].device_kind if backend != 'cpu' else 'cpu'}). "
        "Full reference protocol (targets → task0 sweep 0.1–0.9 → TNR → "
        "dev-F1-optimal thresholds → task123 → collection) for the imported "
        "volpick weights, reference `volpick/model/eval_taks0.py:370-825`, "
        "`eval_taks123.py:20-192`.",
        "",
        f"- dataset: {n_traces} synthetic traces "
        f"({n_events} LP+VT events, {n_noise} noise; VCSEIS unavailable offline); "
        + ("LEGACY easy generator (clean sinusoids — saturates at F1~1.0)" if args.easy else
           "HARD graded-difficulty generator (`make_hard_synthetic_dataset`): "
           "measured SNR %.1f..%.1f dB (median %.1f), FI %.2f..%.2f, colored noise, "
           "emergent onsets, overlapping events, spikes/gaps" % tuple(
               list(np.percentile(dataset.metadata.trace_mean_snr_db.dropna(), [0, 100, 50]))
               + list(np.percentile(dataset.metadata.trace_frequency_index.dropna(), [0, 100])))),
        f"- task0 windows: {len(task0_meta)} "
        f"(dev {sum(task0_meta.trace_split=='dev')}, test {sum(task0_meta.trace_split=='test')})",
        "",
        "## Dev-F1-optimal thresholds → test metrics (task0 protocol)",
        "",
        fmt_table(coll0[[c for c in coll0.columns if not c.startswith("test_")
                         or c in ("test_p_F1score", "test_s_F1score",
                                  "test_p_precision", "test_s_precision",
                                  "test_p_recall", "test_s_recall")]]),
        "",
        "Shipped reference defaults for comparison: PhaseNet P 0.39 / S 0.34; "
        "EQT det 0.10141666, P 0.22, S 0.22 "
        "(`Final_models/volpick/*/volpick.json.v1`).",
        "",
        "## Residual statistics at the dev-optimal threshold (test split)",
        "",
    ]
    res_cols = ["experiment"] + [
        c for c in coll0.columns
        if any(k in c for k in ("_mean", "_std", "_MAE", "_MAD", "outlier"))
    ]
    lines += [fmt_table(coll0[res_cols]) if len(res_cols) > 1 else "(n/a)", ""]
    lines += ["## Task 1 (detection) / Task 2 (P vs S) / Task 3 (onset) — pick benchmark protocol", "",
              fmt_table(coll123), ""]

    # performance-vs-SNR / vs-FI tables (reference Performance_vs_freq_vs_snr)
    for exp in experiments:
        an = exp_stats[exp].get("analysis")
        if not an:
            continue
        lines += [f"## {exp}: performance vs SNR / frequency index (test, dev-optimal thresholds)", ""]
        for key, title in (
            ("p_recall_vs_snr", "P recall vs measured trace SNR (dB)"),
            ("s_recall_vs_snr", "S recall vs measured trace SNR (dB)"),
            ("p_recall_vs_fi", "P recall vs frequency index"),
            ("s_recall_vs_fi", "S recall vs frequency index"),
            ("recall_vs_type", "recall by source type"),
        ):
            if key in an:
                lines += [f"### {title}", "", fmt_table(an[key]), ""]

    # TNR at the shipped thresholds
    tnr_rows = []
    for exp in experiments:
        f = out_base / exp / "test_tnr.csv"
        if f.exists():
            tnr = pd.read_csv(f)
            opt = exp_stats[exp]["opt"]
            for phase in ("p", "s"):
                thr = opt.get(f"{phase}_threshold")
                if thr is None:
                    continue
                j = int(np.argmin(np.abs(tnr["prob_thre"].to_numpy() - thr)))
                tnr_rows.append({
                    "experiment": exp, "phase": phase, "threshold": thr,
                    "test_TNR": tnr.iloc[j][f"{phase}_true_negative_rate"],
                })
    if tnr_rows:
        lines += ["## True-negative rate on pickless windows (test, dev-optimal thresholds)",
                  "", fmt_table(pd.DataFrame(tnr_rows)), ""]

    # diagnosed model-behavior findings: sourced from the committed diagnosis
    # artifacts so a doc regeneration cannot silently drop them (r5 lesson:
    # the r4 bias paragraph was hand-added and lost on the first re-run)
    diag = []
    if (REPO / "docs" / "EQT_BIAS.json").exists():
        b = json.loads((REPO / "docs" / "EQT_BIAS.json").read_text())
        if "P" in b:
            diag += [
                "### EQT onset bias (+0.1-0.2 s) — model behavior, not a pipeline bug",
                "",
                f"Three-way check on identical task0 test windows "
                f"(`scripts/run_eqt_bias_check.py`, `docs/EQT_BIAS.json`): our fused "
                f"path, our demean variant, and a fully independent torch reference "
                f"path agree to {b['P'].get('B_vs_C_argmax_maxdiff_samples', '?')} samples "
                f"(P) — the bias is reproduced by the published weights themselves "
                f"on these synthetics (P mean {b['P'].get('C_torch_demean_mean_s')}s, "
                f"S {b['S'].get('C_torch_demean_mean_s')}s on the torch path).",
                "",
            ]
    if (REPO / "docs" / "S_PLATEAU.json").exists():
        sp = json.loads((REPO / "docs" / "S_PLATEAU.json").read_text())
        pn, eq = sp.get("phasenet", {}), sp.get("eqtransformer", {})
        diag += [
            "### High-SNR S-recall plateau — LP-specific published-weight behavior",
            "",
            f"Both imported models plateau at S recall ~0.65-0.79 even at "
            f">={sp.get('snr_min_db')} dB SNR. Decomposition on "
            f"{pn.get('n_s_in_window')} high-SNR S-labeled test windows "
            f"(`scripts/run_s_plateau_check.py`, `docs/S_PLATEAU.json`): the "
            f"independent torch path reproduces the EXACT same miss sets "
            f"(shared-miss fraction {pn.get('misses_shared_with_torch_frac')}/"
            f"{eq.get('misses_shared_with_torch_frac')}, near-truth peak-prob "
            f"max|ours-torch| {pn.get('near_peak_ours_vs_torch_maxabs')}) — not a "
            f"pipeline artifact. The misses are mostly sub-threshold (median "
            f"near-truth S prob {pn.get('median_near_peak_on_misses')}/"
            f"{eq.get('median_near_peak_on_misses')}), and they concentrate on LP "
            f"events: PhaseNet S recall {pn.get('recall_lp')} (LP) vs "
            f"{pn.get('recall_regular')} (regular); EQT {eq.get('recall_lp')} vs "
            f"{eq.get('recall_regular')}. The published weights under-respond to "
            f"this generator's emergent, low-corner LP S-wave character (S rise "
            f"1-2x the P rise, corner 0.55-0.8x f0p) — a generator-vs-"
            f"training-distribution property, the same class of finding as the "
            f"onset bias. Scratch-trained models on this generator do not show "
            f"the plateau (docs/TRAINING.md S F1 0.83-0.92).",
            "",
        ]
    if diag:
        lines += ["## Diagnosed model-behavior findings", ""] + diag

    lines += ["## Wall times", "", fmt_table(pd.DataFrame([timings]).T.reset_index()
                                             .rename(columns={"index": "stage", 0: "seconds"})), ""]
    lines += ["Reproduce: `python scripts/run_eval_benchmark.py` "
              "(artifacts under /tmp/volpick_eval_out; this file is the committed summary).", ""]

    report = "\n".join(lines)
    if not args.quick:
        (REPO / "docs" / "EVAL.md").write_text(report)
        print("wrote docs/EVAL.md", flush=True)
    else:
        (out_base / "EVAL_quick.md").write_text(report)
        print(report, flush=True)
    print(json.dumps(timings), flush=True)


if __name__ == "__main__":
    main()
