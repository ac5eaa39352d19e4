"""Checkpointing + CSV metrics logging.

Replicates the reference's artifact contract (reference
`volpick/model/train.py:118-176`, `volpick/model/ema.py:421-541`,
`volpick/model/utils.py:190-245`): per-experiment directory with
`metrics.csv`, `hparams.json`, best checkpoint (min monitored loss) +
`last` checkpoint, and paired `*-EMA` weights when EMA is enabled.
Checkpoints are msgpack pytrees (flax.serialization) of
{params, ema_params, swa_params, opt_state, step, epoch}.
"""

from __future__ import annotations

import csv
import json
import math
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np


def save_checkpoint(path, state: Dict):
    from flax import serialization

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # to_state_dict flattens optax NamedTuple states into plain dicts
    state = serialization.to_state_dict(jax.device_get(state))
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(state))


def load_checkpoint(path, target: Optional[Dict] = None) -> Dict:
    """Load a checkpoint; pass `target` (e.g. a freshly initialized state) to
    restore structured leaves like optax states."""
    from flax import serialization

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if target is not None:
        return serialization.from_state_dict(target, raw)
    return raw


class CheckpointManager:
    """Tracks best/last checkpoints like (EMA)ModelCheckpoint(save_top_k=1,
    save_last=True) with the NaN guard of `ema.py:521-532`."""

    def __init__(self, directory, monitor: str = "val_loss", save_ema: bool = False):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.best = math.inf
        # Adopt a pre-existing best checkpoint (resumed run in the same
        # experiment dir) so save_top_k=1 holds across resumes: the stale best
        # is unlinked when a new best is written instead of leaking forever.
        existing = [
            c
            for c in self.dir.glob("epoch=*-step=*.ckpt")
            if not c.stem.endswith("-EMA") and _ckpt_epoch_step(c) is not None
        ]
        self.best_path: Optional[Path] = (
            max(existing, key=_ckpt_epoch_step) if existing else None
        )
        self.save_ema = save_ema

    def _write(self, tag: str, state: Dict, epoch: int, step: int):
        path = self.dir / f"{tag}.ckpt"
        save_checkpoint(path, state)
        if self.save_ema and state.get("ema_params") is not None:
            ema_state = dict(state)
            ema_state["params"] = state["ema_params"]
            save_checkpoint(self.dir / f"{tag}-EMA.ckpt", ema_state)
        return path

    def update(self, state: Dict, metrics: Dict, epoch: int, step: int):
        value = metrics.get(self.monitor, math.nan)
        improved = not (value is None or math.isnan(value)) and value < self.best
        if improved:
            self.best = value
        # stamp the post-update best so a resumed run starts from it and
        # cannot replace this checkpoint with a worse "best"
        state = dict(state, best_monitor=None if math.isinf(self.best) else self.best)
        self._write("last", state, epoch, step)
        if improved:
            new_best = self._write(f"epoch={epoch}-step={step}", state, epoch, step)
            # unlink EVERY other epoch=*-step=* checkpoint (+EMA pair), not
            # just self.best_path: restores the save_top_k=1 on-disk invariant
            # even for directories left with several stale bests by resumes
            for stale in self.dir.glob("epoch=*-step=*.ckpt"):
                if stale.stem.endswith("-EMA"):
                    continue
                if stale != new_best and _ckpt_epoch_step(stale) is not None:
                    stale.unlink(missing_ok=True)
                    stale.with_name(stale.stem + "-EMA.ckpt").unlink(missing_ok=True)
            self.best_path = new_best
        return self.best_path


class CSVMetricsLogger:
    """Append-only metrics.csv (one row per logged dict, like PL CSVLogger)."""

    def __init__(self, directory, hparams: Optional[dict] = None):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / "metrics.csv"
        self._fields = None
        if hparams is not None:
            with open(self.dir / "hparams.json", "w") as f:
                json.dump(_jsonable(hparams), f, indent=2, default=str)

    def log(self, row: Dict):
        row = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v) for k, v in row.items()}
        new_file = not self.path.exists()
        if self._fields is None:
            if new_file:
                self._fields = list(row.keys())
            else:
                with open(self.path) as f:
                    self._fields = next(csv.reader(f))
        for k in row:
            if k not in self._fields:
                self._fields.append(k)
                self._rewrite_with_fields()
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields)
            if new_file:
                w.writeheader()
            w.writerow(row)

    def _rewrite_with_fields(self):
        if not self.path.exists():
            return
        with open(self.path) as f:
            rows = list(csv.DictReader(f))
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields)
            w.writeheader()
            for r in rows:
                w.writerow(r)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def _ckpt_epoch_step(path: Path):
    import re

    m = re.match(r"epoch=(\d+)-step=(\d+)$", path.stem)
    return (int(m.group(1)), int(m.group(2))) if m else None


def find_best_checkpoint(experiment_dir, monitor: str = "val_loss", prefer_ema: bool = True):
    """Scan metrics.csv for the min monitored loss and return the matching
    checkpoint path (reference `volpick/model/utils.py:190-231`).

    If metrics.csv is absent or no logged (epoch, step) matches a kept
    checkpoint, falls back to the numerically latest `epoch=*-step=*.ckpt`
    (CheckpointManager keeps save_top_k=1, so the one kept checkpoint IS the
    best one), then to `last.ckpt`."""
    experiment_dir = Path(experiment_dir)
    ckpts = [
        c
        for c in experiment_dir.glob("checkpoints/epoch=*-step=*.ckpt")
        if not c.stem.endswith("-EMA") and _ckpt_epoch_step(c) is not None
    ]
    if not ckpts:
        last = experiment_dir / "checkpoints" / "last.ckpt"
        return last if last.exists() else None

    best = None
    metrics_path = experiment_dir / "metrics.csv"
    if metrics_path.exists():
        by_key = {_ckpt_epoch_step(c): c for c in ckpts}
        best_val = math.inf
        with open(metrics_path) as f:
            for row in csv.DictReader(f):
                raw = row.get(monitor)
                if raw in (None, ""):
                    continue
                try:
                    val = float(raw)
                    key = (int(float(row.get("epoch", "nan"))), int(float(row.get("step", "nan"))))
                except (TypeError, ValueError):
                    continue
                if not math.isnan(val) and val < best_val and key in by_key:
                    best_val = val
                    best = by_key[key]
    if best is None:
        best = max(ckpts, key=_ckpt_epoch_step)  # numeric, not lexicographic
    if prefer_ema:
        ema = best.with_name(best.stem + "-EMA.ckpt")
        if ema.exists():
            return ema
    return best
