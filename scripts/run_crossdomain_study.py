"""Cross-domain (zero-shot) generalization study (VERDICT r4 missing #2).

The reference evaluates its models on FOREIGN datasets — INSTANCE, STEAD and
a western-US set (`model_training/test_INSTANCE.ipynb`, `test_STEAD.ipynb`,
`Performance_vs_freq_vs_snr/FI_test_westernus`). Those are not fetchable
offline, so this is the offline analogue: a SECOND synthetic domain with
shifted physics (`data.synthetic.SHIFTED_DOMAIN` — corners shifted up,
broader VT bands, faster rises/shorter codas, 3-20 s S-P times, steeper
noise + stronger microseism/hum, LP-minority), never trained on by anything,
evaluated zero-shot by:

  - the imported volpick weights (PhaseNet + EQTransformer), and
  - the hard-benchmark-trained scratch models (training-study checkpoints),

with the full task0 threshold-sweep protocol on the foreign dev+test splits.
Two operating points per model: thresholds re-optimized on the FOREIGN dev
split, and the IN-DOMAIN dev-optimal threshold applied frozen (the strict
zero-shot number). In-domain vs out-of-domain deltas + SNR-bin tables go to
docs/CROSSDOMAIN.md.

Run AFTER run_eval_benchmark.py (+ run_training_study.py for scratch legs):

    timeout 7200 python -u scripts/run_crossdomain_study.py
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

from run_eval_benchmark import fmt_table  # noqa: E402

WEIGHTS = "/root/reference/Final_models/volpick"


def f1_at_threshold(metrics_csv: Path, phase: str, thr: float):
    df = pd.read_csv(metrics_csv)
    j = int(np.argmin(np.abs(df["prob_thre"].to_numpy() - thr)))
    return float(df.iloc[j][f"{phase}_F1score"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/volpick_crossdomain")
    ap.add_argument("--eval-dir", default="/tmp/volpick_crossdomain_out")
    ap.add_argument("--indomain-eval-dir", default="/tmp/volpick_hard_eval_out")
    ap.add_argument("--train-study-dir", default="/tmp/volpick_train_study")
    ap.add_argument("--n-events", type=int, default=2000)
    ap.add_argument("--n-noise", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from volpick_tpu.data.dataset import load_dataset
    from volpick_tpu.data.synthetic import SHIFTED_DOMAIN, make_hard_synthetic_dataset
    from volpick_tpu.eval.analysis import performance_vs_snr_fi
    from volpick_tpu.eval.targets import generate_task0
    from volpick_tpu.eval.task0 import bootstrap_f1_from_artifacts, eval_task0, opt_prob_metrics
    from volpick_tpu.models import from_pretrained
    from volpick_tpu.train.model_io import load_best_model

    data_dir = Path(args.data_dir)
    out_root = Path(args.eval_dir)
    timings = {}

    # --- foreign-domain dataset (dev/test only; nothing ever trains on it) ---
    if not (data_dir / "metadata.csv").exists():
        t0 = time.perf_counter()
        make_hard_synthetic_dataset(
            data_dir, n_events=args.n_events, n_noise=args.n_noise,
            n_samples=12001, seed=77, split_prob=(0.0, 0.3, 0.7),
            domain=SHIFTED_DOMAIN, lp_fraction=0.15,
        )
        timings["dataset_build_s"] = round(time.perf_counter() - t0, 1)
    dataset = load_dataset(data_dir)
    dataset.preload_waveforms()
    md = dataset.metadata
    ev = md[md["source_type"] != "noise"]
    print(f"foreign domain: {len(md)} traces "
          f"(SNR {ev['trace_mean_snr_db'].min():.1f}..{ev['trace_mean_snr_db'].max():.1f} dB, "
          f"FI {ev['trace_frequency_index'].min():.2f}..{ev['trace_frequency_index'].max():.2f})",
          flush=True)

    targets_dir = out_root / "targets"
    if not (targets_dir / "task0.csv").exists():
        t0 = time.perf_counter()
        generate_task0(dataset, targets_dir, keep_source_type=True)
        timings["targets_s"] = round(time.perf_counter() - t0, 1)

    # --- the evaluated models -------------------------------------------------
    legs = {}
    for arch in ("phasenet", "eqtransformer"):
        legs[f"{arch}_volpick"] = (
            lambda a=arch: from_pretrained(a, search_paths=[WEIGHTS]),
            Path(args.indomain_eval_dir) / f"{arch}_volpick",
        )
    study = Path(args.train_study_dir)
    for exp, arch in (("phasenet_scratch", "phasenet"),
                      ("tpupicknet_scratch", "tpupicknet"),
                      ("eqtransformer_scratch", "eqtransformer")):
        if (study / exp / "checkpoints").exists():
            legs[exp] = (
                lambda e=exp, a=arch: load_best_model(study / e, a, prefer_ema=False),
                study / exp / "eval",
            )

    rows = []
    analysis_md = []
    for name, (loader, indomain_dir) in legs.items():
        model, params = loader()
        out_dir = out_root / name
        t0 = time.perf_counter()
        if not (out_dir / "test_metrics.csv").exists():
            eval_task0(model, params, dataset, targets_dir, out_dir)
        timings[f"{name}_sweep_s"] = round(time.perf_counter() - t0, 1)
        opt = opt_prob_metrics(out_dir)  # re-optimized on FOREIGN dev
        row = {"experiment": name}
        for ph in ("p", "s"):
            row[f"ood_{ph}_F1_retuned"] = round(float(opt[f"test_{ph}_F1score"]), 4)
            row[f"ood_{ph}_thr"] = opt[f"{ph}_threshold"]
            ci = bootstrap_f1_from_artifacts(
                out_dir, dataset, targets_dir, "test", ph, float(opt[f"{ph}_threshold"]))
            row[f"ood_{ph}_ci"] = f"[{ci['lo']:.3f},{ci['hi']:.3f}]"
        # frozen in-domain thresholds (strict zero-shot) + in-domain reference
        if (Path(indomain_dir) / "dev_metrics.csv").exists():
            opt_in = opt_prob_metrics(indomain_dir)
            for ph in ("p", "s"):
                thr_in = float(opt_in[f"{ph}_threshold"])
                row[f"ood_{ph}_F1_frozen_thr"] = round(
                    f1_at_threshold(out_dir / "test_metrics.csv", ph, thr_in), 4)
                row[f"id_{ph}_F1"] = round(float(opt_in[f"test_{ph}_F1score"]), 4)
                row[f"{ph}_delta_retuned"] = round(
                    row[f"ood_{ph}_F1_retuned"] - row[f"id_{ph}_F1"], 4)
        rows.append(row)
        print(f"{name}: OOD eval done {json.dumps(row)}", flush=True)

        if name == "phasenet_volpick":
            t0 = time.perf_counter()
            tables = performance_vs_snr_fi(
                model, params, dataset, targets_dir, out_dir / "analysis",
                set_name="test",
                prob_threshold=float(opt["p_threshold"]),
                s_threshold=float(opt["s_threshold"]),
                snr_bins=(-10, 0, 3, 6, 10, 15, 20, 30, 60))
            timings[f"{name}_analysis_s"] = round(time.perf_counter() - t0, 1)
            for key, tdf in tables.items():
                analysis_md += [f"### {name}: {key} (foreign domain)", "",
                                fmt_table(tdf), ""]

    df = pd.DataFrame(rows)
    lines = [
        "# CROSSDOMAIN — zero-shot generalization to a shifted-physics domain",
        "",
        f"Generated by `python scripts/run_crossdomain_study.py` on backend "
        f"`{jax.default_backend()}`. Foreign domain: `SHIFTED_DOMAIN` "
        f"({args.n_events} events + {args.n_noise} noise, dev/test only, "
        "seed 77) — corner frequencies shifted up (LP 1.5-8 Hz, VT 6-24 Hz), "
        "broader VT bands, faster rises and shorter codas, S-P times 3-20 s, "
        "steeper noise (alpha 1.2-2.4) with stronger microseism and cultural "
        "hum, LP fraction 0.15 vs the hard benchmark's 0.4. No model ever "
        "trained on it. Offline analogue of the reference's INSTANCE/STEAD/"
        "western-US legs (`model_training/test_INSTANCE.ipynb`, "
        "`Performance_vs_freq_vs_snr/FI_test_westernus`).",
        "",
        "Columns: `id_*` = in-domain test F1 (docs/EVAL.md / TRAINING.md "
        "artifacts); `ood_*_retuned` = foreign test F1 with thresholds "
        "re-optimized on the foreign dev split (95% bootstrap CI over test "
        "traces); `ood_*_frozen_thr` = the in-domain dev-optimal threshold "
        "applied unchanged (strict zero-shot); `*_delta_retuned` = "
        "out-of-domain minus in-domain.",
        "",
        "## Task0 F1: in-domain vs out-of-domain",
        "",
        fmt_table(df),
        "",
    ]
    if analysis_md:
        lines += ["## Performance vs SNR / FI on the foreign domain", ""] + analysis_md
    lines += ["## Wall times", "",
              fmt_table(pd.DataFrame([timings]).T.reset_index()
                        .rename(columns={"index": "stage", 0: "seconds"})), ""]
    (REPO / "docs" / "CROSSDOMAIN.md").write_text("\n".join(lines))
    print("wrote docs/CROSSDOMAIN.md", flush=True)
    print(json.dumps(timings), flush=True)


if __name__ == "__main__":
    main()
