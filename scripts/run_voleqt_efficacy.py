"""VolEQTransformer efficacy study: does the 4-head LP/regular design
actually discriminate?

VERDICT round-2 item 8: the 4-head variant (reference's abandoned
commented-out design, `/root/reference/volpick/model/models.py:909-1557`)
has mechanics tests and a real-TPU smoke, but nothing showing the rg/lp
detection heads *separate* long-period from regular events. This study
trains VolEQTransformer on the synthetic LP/VT benchmark (docs/EVAL.md
dataset: regular/lp/noise with distinct corner frequencies and decay) and
measures, on the untouched test split:

  - per-head detection AUC (events of the head's own type vs noise),
  - rg-vs-lp discrimination AUC among event windows (per head and for the
    lp-rg score margin),
  - the confusion matrix at the shipped detection threshold 0.10141666
    (`/root/reference/Final_models/volpick/eqt/*`), typed by the larger head,
  - the task123-style score rows ({set}_task1.csv gains score_rg_detection /
    score_lp_detection columns via eval_tasks123).

Run AFTER scripts/run_eval_benchmark.py (reuses its dataset + targets):

    timeout 7200 python -u scripts/run_voleqt_efficacy.py [--cpu] [--epochs 40]

Writes docs/VOLEQT.md.
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

from run_eval_benchmark import fmt_table  # noqa: E402  (same scripts dir)

SHIPPED_DET_THRESHOLD = 0.10141666  # reference eqt default detection threshold


def rank_auc(scores, labels):
    """Mann-Whitney AUC (ties get midranks); no sklearn dependency so the
    study also runs where only the core deps are installed."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels, dtype=bool)
    n1, n0 = int(labels.sum()), int((~labels).sum())
    if n1 == 0 or n0 == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), dtype=np.float64)
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    return float((ranks[labels].sum() - n1 * (n1 + 1) / 2) / (n1 * n0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/volpick_hard_benchmark")
    ap.add_argument("--eval-dir", default="/tmp/volpick_hard_eval_out")
    ap.add_argument("--save-dir", default="/tmp/volpick_voleqt_study")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (the axon sitecustomize "
                         "force-selects the remote TPU otherwise)")
    args = ap.parse_args()

    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from volpick_tpu.data.dataset import load_dataset
    from volpick_tpu.eval.task123 import eval_tasks123
    from volpick_tpu.train.model_io import load_best_model
    from volpick_tpu.train.trainer import train

    data_dir = Path(args.data_dir)
    targets_dir = Path(args.eval_dir) / "targets"
    assert (data_dir / "metadata.csv").exists(), "run scripts/run_eval_benchmark.py first"
    assert (targets_dir / "task1.csv").exists(), "run scripts/run_eval_benchmark.py first"

    timings = {}
    exp = "voleqt_scratch"
    if not args.skip_train:
        cfg = {
            "model": "VolEQTransformer",
            # 4-head loss weighting: split EQT's 0.10 detection weight across
            # the rg/lp heads (reference EQT weights 0.05/0.40/0.55)
            "model_args": {"lr": 1e-3, "loss_weights": (0.05, 0.05, 0.40, 0.55)},
            "data": str(data_dir),
            "batch_size": 256,
            "stack_data": True,
            "ema": True,
            "warmup_steps": 100,
            "trainer_args": {"max_epochs": args.epochs},
            "save_dir": args.save_dir,
            "resume": True,
        }
        t0 = time.perf_counter()
        out = train(cfg, experiment_name=exp)
        timings["train_s"] = round(time.perf_counter() - t0, 1)
        print(f"trained {len(out['history'])} epochs in {timings['train_s']}s",
              flush=True)

    dataset = load_dataset(data_dir)
    dataset.preload_waveforms()
    exp_dir = Path(args.save_dir) / exp
    model, params = load_best_model(exp_dir, "voleqtransformer", prefer_ema=False)

    out_dir = exp_dir / "eval"
    t0 = time.perf_counter()
    eval_tasks123(model, params, dataset, targets_dir, out_dir)
    timings["eval_s"] = round(time.perf_counter() - t0, 1)

    # join source_type onto the task1 prediction rows by trace_idx
    src = dataset.metadata["source_type"].to_numpy()
    sections = []
    rows_auc, rows_conf = [], []
    for set_name in ("dev", "test"):
        f = out_dir / f"{set_name}_task1.csv"
        if not f.exists():
            continue
        df = pd.read_csv(f)
        df["source_type"] = src[df["trace_idx"].to_numpy()]
        is_event = df["trace_type"].eq("earthquake").to_numpy()
        is_lp = df["source_type"].eq("lp").to_numpy()
        rg_s = df["score_rg_detection"].to_numpy()
        lp_s = df["score_lp_detection"].to_numpy()
        det_s = df["score_detection"].to_numpy()

        rows_auc.append({
            "set": set_name,
            "n_event": int(is_event.sum()),
            "n_noise": int((~is_event).sum()),
            # detection: each head against noise windows, events of its type
            "det_auc_combined": rank_auc(det_s, is_event),
            "rg_head_det_auc": rank_auc(
                rg_s[~is_event | ~is_lp], is_event[~is_event | ~is_lp]),
            "lp_head_det_auc": rank_auc(
                lp_s[~is_event | is_lp], is_event[~is_event | is_lp]),
            # discrimination among true event windows: is this window LP?
            "lp_vs_rg_auc_lp_head": rank_auc(lp_s[is_event], is_lp[is_event]),
            "lp_vs_rg_auc_rg_head": rank_auc(-rg_s[is_event], is_lp[is_event]),
            "lp_vs_rg_auc_margin": rank_auc(
                (lp_s - rg_s)[is_event], is_lp[is_event]),
            # argmax typing rule among true events + per-head gating means
            "type_acc_argmax_rule": float(
                ((lp_s > rg_s)[is_event] == is_lp[is_event]).mean()),
            "rg_head_mean_on_rg": float(rg_s[is_event & ~is_lp].mean()),
            "rg_head_mean_on_lp": float(rg_s[is_event & is_lp].mean()),
            "lp_head_mean_on_rg": float(lp_s[is_event & ~is_lp].mean()),
            "lp_head_mean_on_lp": float(lp_s[is_event & is_lp].mean()),
        })

        # typed confusion at the shipped detection threshold: a window is
        # "detected" if either head clears it; its type is the larger head
        detected = np.maximum(rg_s, lp_s) >= SHIPPED_DET_THRESHOLD
        pred = np.where(~detected, "noise", np.where(lp_s > rg_s, "lp", "regular"))
        truth = np.where(~is_event, "noise", np.where(is_lp, "lp", "regular"))
        for t_lab in ("regular", "lp", "noise"):
            row = {"set": set_name, "true": t_lab}
            for p_lab in ("regular", "lp", "noise"):
                row[f"pred_{p_lab}"] = int(((truth == t_lab) & (pred == p_lab)).sum())
            rows_conf.append(row)

    auc_df = pd.DataFrame(rows_auc)
    conf_df = pd.DataFrame(rows_conf)

    # loss curve from metrics.csv (dedup across restarts like TRAINING.md)
    mpath = exp_dir / "metrics.csv"
    curve = ""
    if mpath.exists():
        h = (pd.read_csv(mpath).drop_duplicates("epoch", keep="last")
             .sort_values("epoch").reset_index(drop=True))
        pick = h.iloc[:: max(len(h) // 10, 1)][["epoch", "train_loss", "val_loss"]]
        curve = fmt_table(pick, floatfmt="{:.5f}")

    lines = [
        "# VOLEQT — 4-head LP/regular efficacy study",
        "",
        f"Generated by `python scripts/run_voleqt_efficacy.py` on backend "
        f"`{jax.default_backend()}`. VolEQTransformer trained from scratch on "
        f"the docs/EVAL.md synthetic benchmark (regular/lp/noise; LP events "
        f"use 3.0/1.8 Hz corner frequencies vs 9.0/4.5 Hz regular, "
        f"`volpick_tpu/data/synthetic.py`), batch 256, {args.epochs} epochs, "
        "stacking augmentations + EMA + ReduceLROnPlateau. Detection labels "
        "are gated per trace by `is_lp` (reference's abandoned design, "
        "`models.py:909-1557` commented), so each head only ever sees "
        "positives of its own type.",
        "",
        "## Head AUCs (task1 windows, eval_tasks123 score columns)",
        "",
        "`*_det_auc`: events of the head's type vs noise. `lp_vs_rg_*`: among "
        "true event windows, does the score rank LP above regular "
        "(lp head / negated rg head / lp-rg margin)?",
        "",
        fmt_table(auc_df, floatfmt="{:.4f}"),
        "",
        f"## Typed confusion at the shipped detection threshold ({SHIPPED_DET_THRESHOLD})",
        "",
        "Detected if max(rg, lp) clears the threshold; type = larger head.",
        "",
        fmt_table(conf_df),
        "",
        "## Loss curve",
        "",
        curve,
        "",
        "## Wall times",
        "",
        fmt_table(pd.DataFrame([timings]).T.reset_index()
                  .rename(columns={"index": "stage", 0: "seconds"})),
        "",
    ]
    (REPO / "docs" / "VOLEQT.md").write_text("\n".join(lines))
    print("wrote docs/VOLEQT.md", flush=True)
    print(json.dumps(timings), flush=True)


if __name__ == "__main__":
    main()
