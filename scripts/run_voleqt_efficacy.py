"""VolEQTransformer efficacy study: do the split LP/regular detection heads
actually discriminate event types?

VERDICT round-2 item 8. Trains the 4-head VolEQTransformer on the synthetic
LP/VT benchmark (the reference's abandoned design, reference
`volpick/model/models.py:909-1557` commented), then measures on the test
split:

  - detection AUC (earthquake vs noise) from max(rg, lp) — parity with EQT;
  - event-type discrimination among true events: AUC of is_lp from the
    per-head score difference, and the confusion matrix of the
    "lp if score_lp > score_rg" rule;
  - per-head gating: mean rg-head / lp-head scores by true type.

Run AFTER scripts/run_eval_benchmark.py (reuses dataset + task1 targets):

    timeout 7200 python -u scripts/run_voleqt_efficacy.py

Appends the study to docs/TRAINING.md (or writes docs/VOLEQT.md standalone).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/volpick_eval_benchmark")
    ap.add_argument("--eval-dir", default="/tmp/volpick_eval_out")
    ap.add_argument("--save-dir", default="/tmp/volpick_train_study")
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    import jax
    from sklearn.metrics import roc_auc_score

    from volpick_tpu.data.dataset import load_dataset
    from volpick_tpu.eval.task123 import eval_tasks123
    from volpick_tpu.train.model_io import load_best_model
    from volpick_tpu.train.trainer import train

    data_dir = Path(args.data_dir)
    targets_dir = Path(args.eval_dir) / "targets"
    assert (targets_dir / "task1.csv").exists(), "run scripts/run_eval_benchmark.py first"

    exp = "voleqt_scratch"
    cfg = {
        "model": "VolEQTransformer",
        "model_args": {"lr": 1e-3, "loss_weights": (0.05, 0.05, 0.40, 0.55)},
        "data": str(data_dir),
        "batch_size": 256,
        "stack_data": True,
        "ema": True,
        "warmup_steps": 100,
        "trainer_args": {"max_epochs": args.epochs},
        "save_dir": args.save_dir,
    }
    timings = {}
    if not (args.skip_train and (Path(args.save_dir) / exp / "checkpoints").exists()):
        t0 = time.perf_counter()
        out = train(cfg, experiment_name=exp)
        timings["train_s"] = round(time.perf_counter() - t0, 1)
        print(f"trained {len(out['history'])} epochs", flush=True)

    dataset = load_dataset(data_dir)
    dataset.preload_waveforms()
    model, params = load_best_model(Path(args.save_dir) / exp, "voleqtransformer",
                                    prefer_ema=False)
    out_dir = Path(args.save_dir) / exp / "eval"
    t0 = time.perf_counter()
    eval_tasks123(model, params, dataset, targets_dir, out_dir)
    timings["task123_s"] = round(time.perf_counter() - t0, 1)

    # join per-head scores with true source types
    md = dataset.metadata
    rows = []
    for set_name in ("dev", "test"):
        f = out_dir / f"{set_name}_task1.csv"
        if not f.exists():
            continue
        df = pd.read_csv(f)
        df["source_type"] = md["source_type"].to_numpy()[df["trace_idx"].to_numpy()]
        is_eq = df["trace_type"] == "earthquake"
        det_auc = roc_auc_score(is_eq, df["score_detection"]) if is_eq.nunique() > 1 else np.nan
        ev = df[is_eq].copy()
        ev["is_lp"] = ev["source_type"] == "lp"
        type_score = ev["score_lp_detection"] - ev["score_rg_detection"]
        type_auc = roc_auc_score(ev["is_lp"], type_score) if ev["is_lp"].nunique() > 1 else np.nan
        pred_lp = ev["score_lp_detection"] > ev["score_rg_detection"]
        acc = float((pred_lp == ev["is_lp"]).mean())
        rows.append({
            "set": set_name,
            "n_events": int(is_eq.sum()),
            "n_lp": int(ev["is_lp"].sum()),
            "det_auc_eq_vs_noise": det_auc,
            "type_auc_lp_vs_rg": type_auc,
            "type_acc_argmax_rule": acc,
            "rg_head_mean_on_rg": float(ev.loc[~ev["is_lp"], "score_rg_detection"].mean()),
            "rg_head_mean_on_lp": float(ev.loc[ev["is_lp"], "score_rg_detection"].mean()),
            "lp_head_mean_on_rg": float(ev.loc[~ev["is_lp"], "score_lp_detection"].mean()),
            "lp_head_mean_on_lp": float(ev.loc[ev["is_lp"], "score_lp_detection"].mean()),
        })
    study = pd.DataFrame(rows)
    study.to_csv(out_dir / "voleqt_type_discrimination.csv", index=False)

    lines = [
        "",
        "## VolEQTransformer LP/regular head efficacy",
        "",
        f"4-head VolEQTransformer trained from scratch ({args.epochs} epochs, "
        "batch 256, stacking + EMA) on the synthetic LP/VT benchmark; "
        "per-head detection scores from the task1 protocol "
        "(`score_rg_detection` / `score_lp_detection` columns of the task123 "
        "CSVs). Event-type call = larger head score.",
        "",
        fmt_table(study),
        "",
    ]
    doc = REPO / "docs" / "TRAINING.md"
    if doc.exists():
        doc.write_text(doc.read_text() + "\n".join(lines))
    else:
        (REPO / "docs" / "VOLEQT.md").write_text("# VolEQT efficacy\n" + "\n".join(lines))
    print(study.to_string(), flush=True)
    print(json.dumps(timings), flush=True)


if __name__ == "__main__":
    main()
