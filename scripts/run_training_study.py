"""Training convergence + TPUPickNet head-to-head study (one command).

VERDICT round-2 items 3a/4: (a) train PhaseNet from scratch on the synthetic
benchmark with the full reference recipe (stacking augmentations, EMA,
plateau schedule) and show task0 F1 against the imported-weights model on the
SAME test split; (b) train TPUPickNet with the SAME budget and compare task0
F1 + fused-classify throughput, so the "built for the MXU" claim has a
matched-budget number behind it (or is demoted).

Run AFTER scripts/run_eval_benchmark.py (reuses its dataset + targets +
imported-model results):

    timeout 5400 python -u scripts/run_eval_benchmark.py
    timeout 7200 python -u scripts/run_training_study.py

Writes docs/TRAINING.md.
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


def classify_throughput(model, params, overlap, precision="float32"):
    """Fused classify windows/s on the 8-station 20-min workload (chained
    fori_loop, differenced — same methodology as bench.py)."""
    import jax
    import jax.numpy as jnp

    from volpick_tpu.ops.windows import window_starts
    from volpick_tpu.picker import WaveformPicker

    picker = WaveformPicker(model, params, precision=precision)
    window = model.in_samples
    rng = np.random.default_rng(0)
    data = rng.normal(size=(8, 3, 120000)).astype(np.float32)
    total = data.shape[-1]
    starts = window_starts(total, window, overlap)
    thr = tuple(0.3 for _ in picker._prob_channels())
    chunk = picker._default_batch_size()  # per-arch classify optimum
    run = picker._fused_classify_fn(
        8, len(starts), total, (0, 0), "avg", thr, 64, chunk,
        stride=window - overlap,
        flush_start=int(starts[-1]) if int(starts[-1]) != (len(starts) - 1) * (window - overlap) else None,
    )
    d, st = jnp.asarray(data), jnp.asarray(starts)

    def make_loop(iters):
        @jax.jit
        def loop(d):
            def body(i, carry):
                res = run(picker.params, d + carry * 1e-30, st)
                return sum(jnp.sum(v[1]) for v in res.values()) * 1e-6 + carry * 0.5

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return loop

    la, lb = make_loop(4), make_loop(24)
    float(jax.device_get(la(d)))
    float(jax.device_get(lb(d)))

    def t(loop):
        t0 = time.perf_counter()
        _ = float(jax.device_get(loop(d)))
        return time.perf_counter() - t0

    ta = min(t(la) for _ in range(2))
    tb = min(t(lb) for _ in range(2))
    per_iter = max(tb - ta, 1e-9) / 20
    return 8 * len(starts) / per_iter, chunk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/volpick_hard_benchmark")
    ap.add_argument("--eval-dir", default="/tmp/volpick_hard_eval_out")
    ap.add_argument("--save-dir", default="/tmp/volpick_train_study")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse existing checkpoints, only eval+report")
    ap.add_argument("--no-speed", action="store_true",
                    help="skip the classify-throughput axis (TPU-only)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (the axon sitecustomize "
                         "force-selects the remote TPU otherwise)")
    ap.add_argument("--only", default=None,
                    help="train just this experiment then exit (run each "
                         "training leg in its own process: the axon client "
                         "retains every uploaded per-step batch, ~46 MB/step, "
                         "so one process must not train two full recipes)")
    args = ap.parse_args()

    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from volpick_tpu.data.dataset import load_dataset
    from volpick_tpu.eval.task0 import eval_task0, opt_prob_metrics
    from volpick_tpu.train.model_io import load_best_model
    from volpick_tpu.train.trainer import train

    data_dir = Path(args.data_dir)
    targets_dir = Path(args.eval_dir) / "targets"
    assert (data_dir / "metadata.csv").exists(), "run scripts/run_eval_benchmark.py first"
    assert (targets_dir / "task0.csv").exists(), "run scripts/run_eval_benchmark.py first"

    # matched-budget recipes: identical data/batch/epochs/augs/EMA; lr is the
    # per-architecture tuned value (reference PhaseNet recipe lr 5e-4,
    # `model_training/configs_tune/*.json`; warmup shortened to fit the run)
    recipes = {
        "phasenet_scratch": {
            "model": "PhaseNet",
            "model_args": {"lr": 5e-4},
            "data": str(data_dir),
            "batch_size": 256,
            "stack_data": True,
            "ema": True,
            "warmup_steps": 100,
            "trainer_args": {"max_epochs": args.epochs},
            "save_dir": args.save_dir,
            "resume": True,  # interrupted legs continue as one run
        },
        "tpupicknet_scratch": {
            "model": "TPUPickNet",
            "model_args": {"lr": 1e-3},
            "data": str(data_dir),
            "batch_size": 256,
            "stack_data": True,
            "ema": True,
            "warmup_steps": 100,
            "trainer_args": {"max_epochs": args.epochs},
            "save_dir": args.save_dir,
            "resume": True,
        },
        # optional third leg (--only eqtransformer_scratch): the reference's
        # EQT recipe (EMA, weighted BCE 0.05/0.40/0.55 inside the trainer)
        # on the same matched budget, completing the from-scratch
        # convergence story for the second published architecture
        "eqtransformer_scratch": {
            "model": "EQTransformer",
            "model_args": {"lr": 1e-3},
            "data": str(data_dir),
            "batch_size": 256,
            "stack_data": True,
            "ema": True,
            "warmup_steps": 100,
            "trainer_args": {"max_epochs": args.epochs},
            "save_dir": args.save_dir,
            "resume": True,
        },
    }

    timings = {}
    for exp, cfg in recipes.items():
        if args.only and exp != args.only:
            continue
        if args.skip_train:
            continue  # report-only: never start a leg here, even if absent
        t0 = time.perf_counter()
        out = train(cfg, experiment_name=exp)
        timings[f"{exp}_train_s"] = round(time.perf_counter() - t0, 1)
        print(f"{exp}: trained {len(out['history'])} epochs "
              f"in {timings[f'{exp}_train_s']}s", flush=True)
    if args.only:
        print(json.dumps(timings), flush=True)
        return

    dataset = load_dataset(data_dir)
    dataset.preload_waveforms()

    rows = []
    speed_rows = []
    # the imported-weights PhaseNet numbers from the eval benchmark artifact
    imported_dir = Path(args.eval_dir) / "phasenet_volpick"
    if (imported_dir / "dev_metrics.csv").exists():
        opt = opt_prob_metrics(imported_dir)
        rows.append(dict({"experiment": "phasenet_imported (volpick weights)"},
                         **{k: v for k, v in opt.items()
                            if k in ("p_threshold", "s_threshold", "dev_p_F1score",
                                     "dev_s_F1score", "test_p_F1score", "test_s_F1score",
                                     "test_p_precision", "test_p_recall",
                                     "test_s_precision", "test_s_recall")}))

    arch_of = {"phasenet_scratch": "phasenet", "tpupicknet_scratch": "tpupicknet",
               "eqtransformer_scratch": "eqtransformer"}
    arch_of = {e: a for e, a in arch_of.items()
               if (Path(args.save_dir) / e / "checkpoints").exists()}
    for exp, arch in arch_of.items():
        exp_dir = Path(args.save_dir) / exp
        # EMA decay 0.999 over ~2k steps is still init-biased; use raw best
        model, params = load_best_model(exp_dir, arch, prefer_ema=False)
        out_dir = exp_dir / "eval"
        t0 = time.perf_counter()
        eval_task0(model, params, dataset, targets_dir, out_dir)
        timings[f"{exp}_eval_s"] = round(time.perf_counter() - t0, 1)
        opt = opt_prob_metrics(out_dir)
        rows.append(dict({"experiment": exp},
                         **{k: v for k, v in opt.items()
                            if k in ("p_threshold", "s_threshold", "dev_p_F1score",
                                     "dev_s_F1score", "test_p_F1score", "test_s_F1score",
                                     "test_p_precision", "test_p_recall",
                                     "test_s_precision", "test_s_recall")}))
        print(f"{exp}: eval done", flush=True)

        if not args.no_speed:
            overlap = model.in_samples - 500  # stride 500 for all, like the bench
            t0 = time.perf_counter()
            wps, chunk = classify_throughput(model, params, overlap)
            speed_rows.append({"model": arch, "window": model.in_samples,
                               "stride": 500, "chunk": chunk,
                               "classify_windows_per_s": round(wps, 1)})
            timings[f"{exp}_speed_s"] = round(time.perf_counter() - t0, 1)
            print(f"{exp}: {wps:.0f} windows/s", flush=True)

    f1_df = pd.DataFrame(rows)
    speed_df = pd.DataFrame(speed_rows)

    lines = [
        "# TRAINING — from-scratch convergence + TPUPickNet head-to-head",
        "",
        f"Generated by `python scripts/run_training_study.py` on backend "
        f"`{jax.default_backend()}`. Matched budget: same dataset "
        f"(the 5k-trace synthetic benchmark of docs/EVAL.md), batch 256, "
        f"{args.epochs} epochs, stacking augmentations + EMA + "
        "ReduceLROnPlateau (reference recipe, "
        "`model_training/configs_tune/*.json`).",
        "",
        "## Task0 F1 (dev-optimal threshold protocol, same test split)",
        "",
        fmt_table(f1_df),
        "",
        "## Fused classify throughput (8 stations x 20 min, stride 500, chained on device)",
        "",
        fmt_table(speed_df) if len(speed_df) else "(pending: TPU-only axis, run without --no-speed)",
        "",
        "## Loss curves",
        "",
    ]
    # loss curves come from each experiment's metrics.csv so the report pass
    # works when training ran in separate processes
    for exp in recipes:
        mpath = Path(args.save_dir) / exp / "metrics.csv"
        if not mpath.exists():
            continue
        # metrics.csv appends across restarts; keep the last row per epoch
        h = (pd.read_csv(mpath).drop_duplicates("epoch", keep="last")
             .sort_values("epoch").reset_index(drop=True))
        pick = h.iloc[:: max(len(h) // 12, 1)][["epoch", "train_loss", "val_loss"]]
        n_ep = int(h["epoch"].max()) + 1
        note = (f"trained {n_ep} epochs"
                + (" (interrupted before the full budget)" if n_ep < args.epochs else ""))
        lines += [f"### {exp} — {note}", "", fmt_table(pick, floatfmt="{:.5f}"), ""]
    lines += ["## Wall times", "",
              fmt_table(pd.DataFrame([timings]).T.reset_index()
                        .rename(columns={"index": "stage", 0: "seconds"})), ""]

    (REPO / "docs" / "TRAINING.md").write_text("\n".join(lines))
    print("wrote docs/TRAINING.md", flush=True)
    print(json.dumps(timings), flush=True)


if __name__ == "__main__":
    main()
