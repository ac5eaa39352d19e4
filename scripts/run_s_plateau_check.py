"""Diagnose the high-SNR S-recall plateau (VERDICT r4 weak #8).

docs/EVAL.md shows the imported PhaseNet AND EQTransformer S recall flattening
at ~0.65-0.73 in the 30-60 dB SNR bins while P recall reaches 0.95+. Same
three-way method that nailed the EQT onset bias (scripts/run_eqt_bias_check.py):
for every high-SNR test trace with an S label, compare

  A. our JAX eval path's S probability curve (the production runner), and
  C. the fully independent torch reference path (numpy SteeredWindow +
     demean + per-channel norm + torch forward, strict=True weights)

on IDENTICAL windows, and decompose every miss at the dev-optimal threshold
into (a) "sub-threshold": no S probability >= thr anywhere near the label, vs
(b) "mislocated": a super-threshold S peak exists but lands > 0.5 s away.
If torch misses the same traces the plateau is model-vs-generator behavior
(the published weights do not recognize this generator's S-wave character),
not a pipeline artifact. Reference SNR definition: `volpick/data/utils.py:45-102`;
recall protocol: `eval_taks0.py:326-353`.

Usage:  timeout 3600 python -u scripts/run_s_plateau_check.py [--cpu]
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np
import pandas as pd

WEIGHTS = "/root/reference/Final_models/volpick"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--data-dir", default="/tmp/volpick_hard_benchmark")
    ap.add_argument("--eval-dir", default="/tmp/volpick_hard_eval_out")
    ap.add_argument("--snr-min", type=float, default=30.0)
    ap.add_argument("--n", type=int, default=256)
    args = ap.parse_args()

    import volpick_tpu  # noqa: F401
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from run_eqt_bias_check import steered_numpy, torch_curves

    from volpick_tpu.data.dataset import load_dataset
    from volpick_tpu.eval.task0 import _SteeredRunner, _phase_channels, get_ground_truth
    from volpick_tpu.models import from_pretrained

    dataset = load_dataset(args.data_dir)
    dataset.preload_waveforms()
    md = dataset.metadata
    targets = pd.read_csv(Path(args.eval_dir) / "targets" / "task0.csv")
    targets = targets[targets["trace_split"] == "test"].reset_index(drop=True)
    idx = targets["trace_idx"].to_numpy()
    snr = md["trace_mean_snr_db"].to_numpy()[idx]
    has_s = ~md["trace_s_arrival_sample"].isna().to_numpy()[idx]
    keep = has_s & (snr >= args.snr_min)
    targets = targets[keep].reset_index(drop=True).iloc[: args.n].reset_index(drop=True)
    src_type = md["source_type"].to_numpy()[targets["trace_idx"].to_numpy()]
    print(f"{len(targets)} high-SNR (>= {args.snr_min} dB) S-labeled test windows",
          flush=True)

    report = {"snr_min_db": args.snr_min, "n_windows": int(len(targets))}
    for arch, thr in (("phasenet", None), ("eqtransformer", None)):
        model, params = from_pretrained(arch, search_paths=[WEIGHTS])
        window = model.in_samples
        ch = _phase_channels(model)["S"]
        # dev-optimal S threshold from the committed eval artifacts
        from volpick_tpu.eval.task0 import opt_prob_metrics

        opt = opt_prob_metrics(Path(args.eval_dir) / f"{arch}_volpick")
        thr = float(opt["s_threshold"])

        _, s_gt = get_ground_truth(dataset, targets)
        truth = np.array([g[0] if len(g) else np.nan for g in s_gt])
        # keep only windows whose 30 s task0 window actually contains the S
        # label (the eval protocol's recall denominator works the same way)
        tkeep = np.isfinite(truth)
        targets_m = targets[tkeep].reset_index(drop=True)
        truth = truth[tkeep]
        src_m = src_type[tkeep]

        runner = _SteeredRunner(model, params, batch_size=64)
        curves_a, borders = runner.prob_curves(dataset, targets_m)
        w0s = targets_m["start_sample"].to_numpy() - borders[:, 0]
        xs, w0s_c = steered_numpy(dataset, targets_m, window, model.norm)
        curves_c = torch_curves(arch, xs)

        def classify_misses(curves, w0):
            """Per window: hit / sub-threshold miss / mislocated miss."""
            hits, sub, misloc, near_peak = [], [], [], []
            for i in range(len(curves)):
                c = np.asarray(curves[i, ch], dtype=np.float64)
                t_rel = truth[i] - w0[i]
                lo, hi = int(max(t_rel - 50, 0)), int(min(t_rel + 51, len(c)))
                near = float(c[lo:hi].max()) if hi > lo else 0.0
                near_peak.append(near)
                if near >= thr:
                    hits.append(i)
                elif float(c.max()) >= thr:
                    misloc.append(i)
                else:
                    sub.append(i)
            return hits, sub, misloc, np.asarray(near_peak)

        ha, sa, ma, peak_a = classify_misses(curves_a, w0s)
        hc, sc, mc, peak_c = classify_misses(curves_c, w0s_c)
        both_missed = (set(sa) | set(ma)) & (set(sc) | set(mc))
        missed_a = set(sa) | set(ma)
        lp_mask = src_m == "lp"
        rec_lp_a = np.mean([i in ha for i in np.where(lp_mask)[0]]) if lp_mask.any() else np.nan
        rec_rg_a = np.mean([i in ha for i in np.where(~lp_mask)[0]]) if (~lp_mask).any() else np.nan
        report[arch] = {
            "s_threshold": thr,
            "n_s_in_window": int(len(targets_m)),
            "ours_near_truth_recall": round(len(ha) / len(targets_m), 4),
            "torch_near_truth_recall": round(len(hc) / len(targets_m), 4),
            "ours_sub_threshold_misses": len(sa),
            "ours_mislocated_misses": len(ma),
            "torch_sub_threshold_misses": len(sc),
            "torch_mislocated_misses": len(mc),
            "misses_shared_with_torch_frac": round(
                len(both_missed) / max(len(missed_a), 1), 4),
            "near_peak_ours_vs_torch_maxabs": round(
                float(np.max(np.abs(peak_a - peak_c))), 5),
            "median_near_peak_on_misses": round(
                float(np.median(peak_a[list(missed_a)])) if missed_a else np.nan, 4),
            "recall_lp": round(float(rec_lp_a), 4),
            "recall_regular": round(float(rec_rg_a), 4),
            "n_lp": int(lp_mask.sum()),
            "n_regular": int((~lp_mask).sum()),
        }
        print(json.dumps({arch: report[arch]}, indent=2), flush=True)

    out = REPO / "docs" / "S_PLATEAU.json"
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
