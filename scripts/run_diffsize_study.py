"""Training-size study: task0 F1 vs training fraction (VERDICT r3 item 7).

The reference studies performance as a function of training-set size
(`model_training/diffsize.ipynb`, `train_testsize0.sh`; fraction subsampling
at `volpick/model/train.py:335-359`). This runs the PhaseNet recipe at a
sweep of `training_fraction` values on the hard graded-SNR benchmark with a
fixed epoch budget, evaluates each with the dev-optimal-threshold task0
protocol on the SAME test split, and writes the F1-vs-fraction table to
docs/DIFFSIZE.md.

Run AFTER scripts/run_eval_benchmark.py (reuses dataset + targets). Each
training leg should run in its own process (the axon client retains uploaded
batches):

    for f in 0.05 0.1 0.25 0.5 1.0; do
        timeout 5400 python -u scripts/run_diffsize_study.py --train-fraction $f
    done
    python -u scripts/run_diffsize_study.py          # eval + report
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pandas as pd

from run_eval_benchmark import fmt_table  # noqa: E402

FRACTIONS = (0.05, 0.1, 0.25, 0.375, 0.5, 0.625, 0.75, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/volpick_hard_benchmark")
    ap.add_argument("--eval-dir", default="/tmp/volpick_hard_eval_out")
    ap.add_argument("--save-dir", default="/tmp/volpick_diffsize")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--match-steps", action="store_true",
                    help="scale each leg's epoch budget by 1/effective-"
                         "fraction (capped by --epoch-cap) so every leg gets "
                         "the SAME number of optimizer steps; the fixed-epoch "
                         "protocol starves small fractions of steps (a "
                         "fraction-0.05 leg sees 20x fewer gradients), which "
                         "is what flattened the r4 curve below 0.5")
    ap.add_argument("--epoch-cap", type=int, default=3200)
    ap.add_argument("--train-fraction", type=float, default=None,
                    help="train ONE leg at this fraction, then exit")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--report-only", action="store_true",
                    help="rebuild docs/DIFFSIZE.md from existing eval artifacts"
                         " (no training, no eval; safe while the TPU is busy)")
    ap.add_argument("--rebucket", type=int, default=None, metavar="N",
                    help="repack the benchmark into N-trace HDF5 buckets "
                         "(data/assemble.py repack_dataset, CPU-only) and run "
                         "the study on the copy, so small fractions resolve "
                         "to distinct bucket subsets instead of flooring to "
                         "one coarse bucket; waveforms/targets are identical "
                         "so eval stays comparable")
    args = ap.parse_args()

    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    import jax

    if args.cpu or args.report_only:
        # report-only must never open a second tunnel client (the TPU may be
        # mid-training); it only reads CSVs and metadata
        jax.config.update("jax_platforms", "cpu")

    from volpick_tpu.data.dataset import load_dataset
    from volpick_tpu.eval.task0 import eval_task0, opt_prob_metrics
    from volpick_tpu.train.model_io import load_best_model
    from volpick_tpu.train.trainer import train

    data_dir = Path(args.data_dir)
    targets_dir = Path(args.eval_dir) / "targets"
    assert (data_dir / "metadata.csv").exists(), "run scripts/run_eval_benchmark.py first"
    assert (targets_dir / "task0.csv").exists(), "run scripts/run_eval_benchmark.py first"

    if args.rebucket:
        from volpick_tpu.data.assemble import repack_dataset

        fine_dir = data_dir.parent / f"{data_dir.name}_b{args.rebucket}"
        if not (fine_dir / "metadata.csv").exists():
            n = repack_dataset(data_dir, fine_dir, bucket_size=args.rebucket)
            print(f"repacked {data_dir} -> {fine_dir} ({n} buckets)", flush=True)
        data_dir = fine_dir
        args.save_dir = f"{args.save_dir}_b{args.rebucket}"
    if args.match_steps:
        args.save_dir = f"{args.save_dir}_ms"

    def cfg(frac):
        return {
            "model": "PhaseNet",
            "model_args": {"lr": 5e-4},
            "data": str(data_dir),
            "batch_size": 256,
            "stack_data": True,
            "ema": True,
            "warmup_steps": 100,
            "training_fraction": frac,
            "trainer_args": {"max_epochs": args.epochs},
            "save_dir": args.save_dir,
            "resume": True,
        }

    # effective fraction actually trained on: block subsampling keeps whole
    # HDF5 buckets (reference-exact, train.py:335-359), so on a coarse-packed
    # dataset several requested fractions can floor to the same bucket set.
    # Computed with the REAL apply_training_fraction on a throwaway split so
    # the reported columns cannot drift from what training did.
    from volpick_tpu.data.dataset import WaveformDataset
    from volpick_tpu.train.trainer import apply_training_fraction

    tr_full = WaveformDataset(data_dir)
    tr_full.filter((tr_full.metadata["split"] == "train").to_numpy())
    n_total = len(tr_full)
    n_blocks_total = (
        tr_full.metadata["trace_name"].astype(str).str.split("$").str[0].nunique()
    )

    def effective(frac):
        sub = WaveformDataset(data_dir)
        sub.filter((sub.metadata["split"] == "train").to_numpy())
        apply_training_fraction(frac, sub)
        kept = sub.metadata["trace_name"].astype(str).str.split("$").str[0].nunique()
        return kept, len(sub), round(len(sub) / n_total, 4)

    def leg_epochs(frac):
        if not args.match_steps:
            return args.epochs
        _, _, eff = effective(frac)
        return min(int(round(args.epochs / max(eff, 1e-6))), args.epoch_cap)

    if args.train_fraction is not None:
        frac = args.train_fraction
        exp = f"phasenet_frac{frac:g}"
        c = cfg(frac)
        n_ep = leg_epochs(frac)
        c["trainer_args"]["max_epochs"] = n_ep
        # matched-step legs inflate epochs up to epoch_cap; validate at a
        # fixed ~args.epochs cadence so wall time tracks optimizer steps, not
        # the per-epoch val loop (trainer check_val_every_n_epoch)
        c["trainer_args"]["check_val_every_n_epoch"] = max(1, n_ep // args.epochs)
        t0 = time.perf_counter()
        out = train(c, experiment_name=exp)
        print(json.dumps({exp: {"epochs": len(out["history"]),
                                "max_epochs": c["trainer_args"]["max_epochs"],
                                "train_s": round(time.perf_counter() - t0, 1)}}),
              flush=True)
        return

    dataset = load_dataset(data_dir)
    if not args.report_only:
        dataset.preload_waveforms()

    rows, timings = [], {}
    for frac in FRACTIONS:
        exp = f"phasenet_frac{frac:g}"
        exp_dir = Path(args.save_dir) / exp
        if not (exp_dir / "checkpoints").exists():
            print(f"{exp}: no checkpoints, skipping", flush=True)
            continue
        if args.report_only:
            if not (exp_dir / "eval").exists():
                print(f"{exp}: no eval artifacts, skipping (report-only)", flush=True)
                continue
        else:
            model, params = load_best_model(exp_dir, "phasenet", prefer_ema=False)
            t0 = time.perf_counter()
            eval_task0(model, params, dataset, targets_dir, exp_dir / "eval")
            timings[f"{exp}_eval_s"] = round(time.perf_counter() - t0, 1)
        opt = opt_prob_metrics(exp_dir / "eval")
        h = pd.read_csv(exp_dir / "metrics.csv").drop_duplicates("epoch", keep="last")
        n_buckets, n_traces, eff = effective(frac)
        rows.append({
            "fraction": frac,
            "buckets": n_buckets,
            "eff_fraction": eff,
            "epochs": int(h["epoch"].max()) + 1,
            "final_val_loss": round(float(h.sort_values("epoch")["val_loss"].iloc[-1]), 5),
            **{k: opt[k] for k in ("p_threshold", "dev_p_F1score", "test_p_F1score",
                                   "s_threshold", "dev_s_F1score", "test_s_F1score")
               if k in opt},
        })
        print(f"{exp}: eval done", flush=True)

    df = pd.DataFrame(rows)
    if df.empty:
        print("no evaluated legs found; leaving docs/DIFFSIZE.md untouched", flush=True)
        return
    import jax as _jax

    doc = REPO / "docs" / "DIFFSIZE.md"
    if args.rebucket:
        # append (or refresh) a fine-bucket section under the committed
        # coarse table, which stays as the reference-exact-behavior exhibit
        marker = "## Fine-bucket re-run"
        base = doc.read_text() if doc.exists() else "# DIFFSIZE\n"
        base = base.split(marker)[0].rstrip() + "\n"
        budget_note = (
            f"MATCHED-STEP budget: each leg trains ~{args.epochs}/eff_fraction "
            f"epochs (cap {args.epoch_cap}) so every point gets the same "
            "number of optimizer steps — the fixed-150-epoch protocol gave a "
            "fraction-0.05 leg 20x fewer gradient steps, which floored the "
            "r4 curve below fraction 0.5 (VERDICT r4 weak #5); epochs-seen "
            "per leg is in the `epochs` column"
            if args.match_steps else
            f"Same recipe and fixed {args.epochs}-epoch budget"
        )
        lines = [
            base,
            f"{marker} (`--rebucket {args.rebucket}"
            + ("` + `--match-steps`)" if args.match_steps else "`)"),
            "",
            f"{budget_note}, on the content-identical repack "
            f"({n_blocks_total} train buckets of ≤{args.rebucket} traces, "
            "`data.assemble.repack_dataset`) so every requested fraction "
            "selects a distinct bucket subset:",
            "",
            fmt_table(df),
            "",
        ]
        doc.write_text("\n".join(lines))
        print("appended fine-bucket section to docs/DIFFSIZE.md", flush=True)
        print(json.dumps(timings), flush=True)
        return
    lines = [
        "# DIFFSIZE — task0 F1 vs training fraction",
        "",
        f"Generated by `python scripts/run_diffsize_study.py` (report pass on "
        f"backend `{_jax.default_backend()}`; the per-fraction training legs "
        "each ran as their own TPU process). PhaseNet recipe (batch 256, "
        f"{args.epochs}-epoch budget, stacking augmentations + EMA + plateau "
        "schedule) on the hard graded-SNR benchmark of docs/EVAL.md; "
        "`training_fraction` subsamples whole HDF5 buckets deterministically "
        "(`train/trainer.py apply_training_fraction`). Reference: "
        "`model_training/diffsize.ipynb`, `volpick/model/train.py:335-359`.",
        "",
        "NOTE on granularity: block subsampling keeps whole HDF5 buckets "
        f"(reference-exact), and this benchmark's train split packs into only "
        f"{n_blocks_total} buckets — requested fractions below 1/{n_blocks_total} floor "
        "to the same single bucket (`eff_fraction` is what each leg actually "
        "trained on). On the reference's real datasets (thousands of buckets) "
        "the requested and effective fractions coincide. To resolve small "
        "fractions here, run the same study with `--rebucket 32` (content-"
        "identical repack via `data.assemble.repack_dataset`; 0.05/0.10/0.25 "
        "then select 8/17/43 distinct buckets instead of flooring to one).",
        "",
        "## Dev-optimal-threshold task0 metrics vs fraction (same test split)",
        "",
        fmt_table(df),
        "",
    ]
    if timings:
        lines += [
            "## Wall times",
            "",
            fmt_table(pd.DataFrame([timings]).T.reset_index()
                      .rename(columns={"index": "stage", 0: "seconds"})),
            "",
        ]
    # a coarse rewrite must not drop a previously appended fine-bucket section
    if doc.exists() and "## Fine-bucket re-run" in doc.read_text():
        old = doc.read_text()
        lines.append("## Fine-bucket re-run" + old.split("## Fine-bucket re-run", 1)[1])
    doc.write_text("\n".join(lines))
    print("wrote docs/DIFFSIZE.md", flush=True)
    print(json.dumps(timings), flush=True)


if __name__ == "__main__":
    main()
