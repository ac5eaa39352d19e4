"""Tasks 1/2/3: SeisBench pick-benchmark protocol (reference
`volpick/model/eval_taks123.py`).

- eval_tasks123: steered inference producing per-window
  (score_detection, score_p_or_s, p_sample_pred, s_sample_pred) —
  the predict_step contract of the reference (`models.py:454-480`, `:881-906`)
  — written to {set}_task{1,23}.csv;
- parse_task1: detection PR/AUC with the dev-F1-optimal threshold applied to
  test;
- parse_task23: P-vs-S precision/recall/F1 + MCC (50-candidate threshold
  scan) and onset-residual statistics (mean/median/RMSE/MAE, outlier fraction
  and |r|<1 s trimmed variants).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from volpick_tpu.pipeline.generator import (
    RawBatchSource,
    steered_frames,
    steered_window_offsets,
)


def _predict_scores(model, params, dataset, targets: pd.DataFrame, batch_size: int = 256):
    """Batched predict_step: masked max/argmax within the steered region.

    Framing + conditioning + forward + score reduction compile into one
    program per batch (`steered_frames`); only raw trace buffers ship to the
    device and only 4 scalars per window come back."""
    is_eqt = model.name in ("EQTransformer", "VolEQTransformer")
    is_voleqt = model.name == "VolEQTransformer"
    window = model.in_samples

    @jax.jit
    def forward(params, x_raw, w0, borders):
        # demean for all models: reference eval augs (`models.py:849-856`)
        x = steered_frames(x_raw, w0, window, detrend=False, norm=model.norm)
        t = jnp.arange(window)[None, :]
        mask = (t >= borders[:, :1]) & (t < borders[:, 1:2])
        extra = ()
        if is_voleqt:
            # commented reference predict_step (`models.py:1310-1374`):
            # score_detection = max over max(rg, lp); plus per-type scores
            rg, lp, p, s = model.apply(params, x)
            rg_m = jnp.where(mask, rg, -jnp.inf)
            lp_m = jnp.where(mask, lp, -jnp.inf)
            p_m = jnp.where(mask, p, -jnp.inf)
            s_m = jnp.where(mask, s, -jnp.inf)
            score_det = jnp.max(jnp.maximum(rg_m, lp_m), axis=-1)
            score_ps = jnp.max(p_m, axis=-1) / jnp.max(s_m, axis=-1)
            p_sample = jnp.argmax(p_m, axis=-1)
            s_sample = jnp.argmax(s_m, axis=-1)
            extra = (
                jnp.max(rg_m, axis=-1),
                jnp.max(lp_m, axis=-1),
                jnp.max(rg_m, axis=-1) / jnp.max(lp_m, axis=-1),
            )
        elif is_eqt:
            det, p, s = model.apply(params, x)
            det_m = jnp.where(mask, det, -jnp.inf)
            p_m = jnp.where(mask, p, -jnp.inf)
            s_m = jnp.where(mask, s, -jnp.inf)
            score_det = jnp.max(det_m, axis=-1)
            score_ps = jnp.max(p_m, axis=-1) / jnp.max(s_m, axis=-1)
            p_sample = jnp.argmax(p_m, axis=-1)
            s_sample = jnp.argmax(s_m, axis=-1)
        else:
            pred = model.apply(params, x)
            pi, si, ni = (model.phases.index(c) for c in "PSN")
            p_m = jnp.where(mask, pred[:, pi], -jnp.inf)
            s_m = jnp.where(mask, pred[:, si], -jnp.inf)
            n_m = jnp.where(mask, pred[:, ni], jnp.inf)
            score_det = jnp.max(1 - n_m, axis=-1)
            score_ps = jnp.max(p_m, axis=-1) / jnp.max(s_m, axis=-1)
            p_sample = jnp.argmax(p_m, axis=-1)
            s_sample = jnp.argmax(s_m, axis=-1)
        return (score_det, score_ps, p_sample, s_sample) + extra

    idxs = targets["trace_idx"].to_numpy()
    ss = targets["start_sample"].to_numpy()
    es = targets["end_sample"].to_numpy()
    src = RawBatchSource(dataset)
    cols = ["score_detection", "score_p_or_s", "p_sample_pred", "s_sample_pred"]
    if is_voleqt:
        cols += ["score_rg_detection", "score_lp_detection", "score_rg_or_lp"]
    out = {k: [] for k in cols}
    for lo in range(0, len(targets), batch_size):
        hi = min(lo + batch_size, len(targets))
        batch = src.take(idxs[lo:hi])
        w0, borders = steered_window_offsets(batch["len"], ss[lo:hi], es[lo:hi], window)
        x = batch["x"]
        pad = batch_size - (hi - lo)
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            w0 = np.concatenate([w0, np.zeros(pad, dtype=w0.dtype)])
            borders = np.concatenate([borders, np.tile([[0, window]], (pad, 1))])
        res = forward(params, jnp.asarray(x), jnp.asarray(w0), jnp.asarray(borders))
        det, ps, p_s, s_s = res[:4]
        n = hi - lo
        # predictions are window-relative; re-offset to region-relative samples
        # (the reference predict_step slices the region, so its argmax is
        # region-relative: subtract border_lo)
        out["score_detection"].append(np.asarray(det)[:n])
        out["score_p_or_s"].append(np.asarray(ps)[:n])
        out["p_sample_pred"].append(np.asarray(p_s)[:n] - borders[:n, 0])
        out["s_sample_pred"].append(np.asarray(s_s)[:n] - borders[:n, 0])
        if is_voleqt:
            out["score_rg_detection"].append(np.asarray(res[4])[:n])
            out["score_lp_detection"].append(np.asarray(res[5])[:n])
            out["score_rg_or_lp"].append(np.asarray(res[6])[:n])
    return {k: np.concatenate(v) for k, v in out.items()}


def eval_tasks123(
    model,
    params,
    dataset,
    targets_path,
    output_dir,
    sets: Sequence[str] = ("dev", "test"),
    batch_size: int = 256,
    num_test_run: Optional[int] = None,
):
    """Writes {set}_task1.csv and {set}_task23.csv prediction tables."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    targets_path = Path(targets_path)
    for task, fname in (("1", "task1.csv"), ("23", "task23.csv")):
        f = targets_path / fname
        if not f.exists():
            continue
        all_targets = pd.read_csv(f)
        for set_name in sets:
            targets = all_targets[all_targets["trace_split"] == set_name].reset_index(drop=True)
            if num_test_run:
                targets = targets.sample(min(num_test_run, len(targets)), random_state=42).reset_index(drop=True)
            if not len(targets):
                continue
            scores = _predict_scores(model, params, dataset, targets, batch_size)
            pred = targets.copy()
            for k, v in scores.items():
                pred[k] = v
            # absolute onset prediction for task3 convenience: region-relative
            # sample + start_sample gives the trace-absolute sample
            pred.to_csv(output_dir / f"{set_name}_task{task}.csv", index=False)
    return output_dir


def parse_task1(exp_dir) -> Dict:
    from sklearn.metrics import (
        precision_recall_curve,
        precision_recall_fscore_support,
        roc_auc_score,
    )

    exp_dir = Path(exp_dir)
    if not ((exp_dir / "dev_task1.csv").is_file() and (exp_dir / "test_task1.csv").is_file()):
        return {}
    dev = pd.read_csv(exp_dir / "dev_task1.csv")
    test = pd.read_csv(exp_dir / "test_task1.csv")
    dev["bin"] = dev["trace_type"] == "earthquake"
    test["bin"] = test["trace_type"] == "earthquake"

    prec, recall, thr = precision_recall_curve(dev["bin"], dev["score_detection"])
    with np.errstate(invalid="ignore"):
        f1 = 2 * prec * recall / (prec + recall)
    auc = roc_auc_score(dev["bin"], dev["score_detection"]) if dev["bin"].nunique() > 1 else np.nan
    opt = int(np.nanargmax(f1))
    opt_thr = thr[min(opt, len(thr) - 1)]
    stats = {
        "dev_det_precision": prec[opt],
        "dev_det_recall": recall[opt],
        "dev_det_f1": f1[opt],
        "dev_det_auc": auc,
        "det_threshold": opt_thr,
    }
    p, r, f, _ = precision_recall_fscore_support(
        test["bin"], test["score_detection"] > opt_thr, average="binary", zero_division=0
    )
    stats.update(
        {
            "test_det_precision": p,
            "test_det_recall": r,
            "test_det_f1": f,
            "test_det_auc": roc_auc_score(test["bin"], test["score_detection"])
            if test["bin"].nunique() > 1
            else np.nan,
        }
    )
    return stats


def parse_task23(exp_dir) -> Dict:
    from sklearn.metrics import (
        matthews_corrcoef,
        precision_recall_curve,
        precision_recall_fscore_support,
    )

    exp_dir = Path(exp_dir)
    if not ((exp_dir / "dev_task23.csv").is_file() and (exp_dir / "test_task23.csv").is_file()):
        return {}
    dev = pd.read_csv(exp_dir / "dev_task23.csv")
    test = pd.read_csv(exp_dir / "test_task23.csv")
    for df in (dev, test):
        df["bin"] = df["phase_label"] == "P"
        for col in ("s_sample_pred", "score_p_or_s"):
            if col not in df.columns:
                df[col] = np.nan
        df["score_p_or_s"] = np.clip(df["score_p_or_s"].to_numpy(), -1e100, 1e100)

    stats: Dict = {}
    dev_r = dev[~np.isnan(dev["score_p_or_s"])]
    if len(dev_r):
        prec, recall, thr = precision_recall_curve(dev_r["bin"], dev_r["score_p_or_s"])
        with np.errstate(invalid="ignore"):
            f1 = 2 * prec * recall / (prec + recall)
        opt = int(np.nanargmax(f1))
        opt_thr = thr[min(opt, len(thr) - 1)]
        mcc_thrs = np.sort(dev["score_p_or_s"].to_numpy())
        mcc_thrs = mcc_thrs[np.linspace(0, len(mcc_thrs) - 1, 50, dtype=int)]
        mccs = [matthews_corrcoef(dev["bin"], dev["score_p_or_s"] > t) for t in mcc_thrs]
        stats.update(
            {
                "dev_phase_precision": prec[opt],
                "dev_phase_recall": recall[opt],
                "dev_phase_f1": f1[opt],
                "phase_threshold": opt_thr,
                "dev_phase_mcc": np.max(mccs),
                "phase_threshold_mcc": mcc_thrs[int(np.argmax(mccs))],
            }
        )
        test_r = test[~np.isnan(test["score_p_or_s"])]
        p, r, f, _ = precision_recall_fscore_support(
            test_r["bin"], test_r["score_p_or_s"] > opt_thr, average="binary", zero_division=0
        )
        stats.update(
            {
                "test_phase_precision": p,
                "test_phase_recall": r,
                "test_phase_f1": f,
                "test_phase_mcc": matthews_corrcoef(
                    test["bin"], test["score_p_or_s"] > stats["phase_threshold_mcc"]
                ),
            }
        )

    for pred, set_str in ((dev, "dev"), (test, "test")):
        for phase in ("P", "S"):
            sub = pred[pred["phase_label"] == phase]
            col = f"{phase.lower()}_sample_pred"
            if not len(sub):
                continue
            # predictions are region-relative; onsets are trace-absolute
            diff = (sub[col] + sub["start_sample"] - sub["phase_onset"]) / sub["sampling_rate"]
            diff = diff.to_numpy()
            stats[f"{set_str}_{phase}_mean_s"] = np.mean(diff)
            stats[f"{set_str}_{phase}_median_s"] = np.median(diff)
            stats[f"{set_str}_{phase}_rmse_s"] = np.sqrt(np.mean(diff**2))
            stats[f"{set_str}_{phase}_mae_s"] = np.mean(np.abs(diff))
            trimmed = diff[(diff > -1) & (diff < 1)]
            stats[f"{set_str}_{phase}_out_s"] = np.sum((diff > 1) | (diff < -1)) / len(diff)
            stats[f"{set_str}_{phase}_modified_rmse_s"] = (
                np.sqrt(np.mean(trimmed**2)) if len(trimmed) else np.nan
            )
            stats[f"{set_str}_{phase}_modified_mae_s"] = (
                np.mean(np.abs(trimmed)) if len(trimmed) else np.nan
            )
    return stats


def get_optimal_model(df: pd.DataFrame) -> Optional[int]:
    """Multi-metric model ranking (reference `eval_taks0.py:1297-1305`):
    normalize dev detection AUC, phase MCC, and inverse P/S residual stds to
    their column maxima and pick the row with the best mean."""
    cols = ["dev_det_auc", "dev_phase_mcc"]
    for phase in ("P", "S"):
        for cand in (f"dev_{phase}_std_s", f"dev_{phase}_rmse_s"):
            if cand in df.columns:
                cols.append(cand)
                break
    have = [c for c in cols if c in df.columns]
    if not have:
        return None
    x = df[have].to_numpy(dtype=float).copy()
    for i, c in enumerate(have):
        if c.endswith("_std_s") or c.endswith("_rmse_s"):
            x[:, i] = 1.0 / x[:, i]
    with np.errstate(invalid="ignore"):
        x /= np.nanmax(x, axis=0, keepdims=True)
        means = np.nanmean(x, axis=1)
    if np.isnan(means).all():
        return None
    return int(np.nanargmax(means))


def collect_task123_results(base_dir, experiments: Sequence[str]) -> pd.DataFrame:
    rows = []
    for exp in experiments:
        d = Path(base_dir) / exp
        row = {"experiment": exp}
        row.update(parse_task1(d))
        row.update(parse_task23(d))
        rows.append(row)
    return pd.DataFrame(rows)
