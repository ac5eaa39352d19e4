"""Diagnose the EQT +0.13 s (P) / +0.17 s (S) onset bias (VERDICT r3 item 3).

Three pick-residual measurements on the SAME task0 test windows:

  A. our eval path as-is            (_SteeredRunner: detrend for EQT)
  B. our eval path, demean variant  (reference eval-aug semantics)
  C. torch reference path           (independent numpy SteeredWindow + demean
                                     + per-channel norm + torch forward)

Reference eval augs are SteeredWindow + Normalize(demean_axis=-1, ...) with NO
detrend (`volpick/model/models.py:849-856`; detrend appears only in the EQT
TRAINING block, models.py:663). If B == C and A is shifted, the detrend is a
residual alignment bug in our eval runner; if A == B == C all show the shift,
it is model behavior on these synthetics — either way docs/EVAL.md gets the
paragraph and, if a bug, the fix + regression test.

Usage:  timeout 3600 python -u scripts/run_eqt_bias_check.py [--n 256] [--cpu]
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


def torch_curves(arch, windows):
    """Reference-path probability curves: torch forward on pre-conditioned
    (B, C, W) windows. Returns (B, K, W) with K matching our channel layout."""
    import torch

    from torch_oracle import EQTransformerTorch, PhaseNetTorch

    if arch == "eqtransformer":
        tm = EQTransformerTorch()
        sd = torch.load(f"{WEIGHTS}/eqtransformer/volpick.pt.v1", map_location="cpu",
                        weights_only=True)
    else:
        tm = PhaseNetTorch()
        sd = torch.load(f"{WEIGHTS}/phasenet/volpick.pt.v1", map_location="cpu",
                        weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    tm.load_state_dict(sd, strict=True)
    tm.eval()
    outs = []
    with torch.no_grad():
        for lo in range(0, len(windows), 64):
            x = torch.from_numpy(windows[lo : lo + 64])
            y = tm(x)
            outs.append(np.stack([o.numpy() for o in y], 1) if isinstance(y, tuple)
                        else y.numpy())
    return np.concatenate(outs)


def steered_numpy(dataset, targets, window, norm):
    """Independent numpy SteeredWindow(strategy='pad') + demean + amp-norm."""
    xs, w0s = [], []
    for _, row in targets.iterrows():
        x = dataset.get_waveforms(int(row["trace_idx"])).astype(np.float64)
        n = x.shape[-1]
        ss, es = int(row["start_sample"]), int(row["end_sample"])
        w0 = ss - (window - (es - ss)) // 2
        w0 = int(np.clip(w0, 0, max(n - window, 0)))
        seg = x[:, w0 : w0 + window]
        if seg.shape[-1] < window:
            seg = np.pad(seg, ((0, 0), (0, window - seg.shape[-1])))
        seg = seg - seg.mean(-1, keepdims=True)
        amp = (np.abs(seg).max(-1, keepdims=True) if norm == "peak"
               else seg.std(-1, keepdims=True))
        seg = seg / np.maximum(amp, 1e-10)
        xs.append(seg.astype(np.float32))
        w0s.append(w0)
    return np.stack(xs), np.asarray(w0s)


def residuals(curves, w0s, truth, chan, borders=None, starts=None):
    """Argmax-pick residual (samples) per window; NaN when truth is absent."""
    out = []
    for i in range(len(curves)):
        if np.isnan(truth[i]):
            out.append(np.nan)
            continue
        c = curves[i, chan]
        out.append(w0s[i] + int(np.argmax(c)) - truth[i])
    return np.asarray(out, dtype=float)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--data-dir", default="/tmp/volpick_hard_benchmark")
    ap.add_argument("--eval-dir", default="/tmp/volpick_hard_eval_out")
    ap.add_argument("--arch", default="eqtransformer",
                    choices=["eqtransformer", "phasenet"])
    args = ap.parse_args()

    import volpick_tpu  # noqa: F401  (compilation cache)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from volpick_tpu.data.dataset import load_dataset
    from volpick_tpu.eval.task0 import _SteeredRunner, _phase_channels, get_ground_truth
    from volpick_tpu.models import from_pretrained

    dataset = load_dataset(args.data_dir)
    dataset.preload_waveforms()
    targets = pd.read_csv(Path(args.eval_dir) / "targets" / "task0.csv")
    targets = targets[targets["trace_split"] == "test"].reset_index(drop=True)
    # event windows only, deterministic subset
    md = dataset.metadata
    has_p = ~md["trace_p_arrival_sample"].isna().to_numpy()[targets["trace_idx"].to_numpy()]
    targets = targets[has_p].reset_index(drop=True).iloc[: args.n].reset_index(drop=True)

    model, params = from_pretrained(args.arch, search_paths=[WEIGHTS])
    window = model.in_samples
    chans = _phase_channels(model)
    p_gt, s_gt = get_ground_truth(dataset, targets)
    p_truth = np.array([g[0] if len(g) else np.nan for g in p_gt])
    s_truth = np.array([g[0] if len(g) else np.nan for g in s_gt])

    # --- A: our path as-is ---------------------------------------------------
    runner = _SteeredRunner(model, params, batch_size=64)
    curves_a, borders = runner.prob_curves(dataset, targets)
    w0s = targets["start_sample"].to_numpy() - borders[:, 0]

    # --- B: our path, demean (reference eval-aug semantics) ------------------
    import jax.numpy as jnp

    from volpick_tpu.pipeline.generator import steered_frames

    @jax.jit
    def fwd_demean(params_, x_raw, w0):
        frames = steered_frames(x_raw, w0, window, detrend=False, norm=model.norm)
        out = model.apply(params_, frames)
        return jnp.stack(out, axis=1) if isinstance(out, tuple) else out

    runner_b = _SteeredRunner(model, params, batch_size=64)
    runner_b._forward = fwd_demean
    curves_b, _ = runner_b.prob_curves(dataset, targets)

    # --- C: torch reference path ---------------------------------------------
    xs, w0s_c = steered_numpy(dataset, targets, window, model.norm)
    assert np.array_equal(w0s_c, w0s.astype(w0s_c.dtype)), "window placement differs"
    curves_c = torch_curves(args.arch, xs)

    report = {}
    for phase, truth in (("P", p_truth), ("S", s_truth)):
        ch = chans[phase]
        ra = residuals(curves_a, w0s, truth, ch)
        rb = residuals(curves_b, w0s, truth, ch)
        rc = residuals(curves_c, w0s_c, truth, ch)
        keep = ~np.isnan(ra) & (np.abs(ra) <= 100) & (np.abs(rb) <= 100) & (np.abs(rc) <= 100)
        report[phase] = {
            "n": int(keep.sum()),
            "A_ours_detrend_mean_s": round(float(np.mean(ra[keep])) / 100, 4),
            "B_ours_demean_mean_s": round(float(np.mean(rb[keep])) / 100, 4),
            "C_torch_demean_mean_s": round(float(np.mean(rc[keep])) / 100, 4),
            "B_vs_C_argmax_maxdiff_samples": int(np.max(np.abs(rb[keep] - rc[keep]))),
            "A_vs_B_argmax_maxdiff_samples": int(np.max(np.abs(ra[keep] - rb[keep]))),
            "curve_maxabs_B_vs_C": float(np.max(np.abs(
                curves_b[:, ch] - curves_c[:, ch]))),
        }
    print(json.dumps(report, indent=2), flush=True)
    out = Path("/tmp/eqt_bias_check.json")
    out.write_text(json.dumps({"arch": args.arch, **report}, indent=2))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
