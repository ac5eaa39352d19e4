"""Experiment-artifact model loading + native pretrained export.

Covers the reference's `volpick/model/utils.py` surface: best/last checkpoint
selection from an experiment directory (EMA-aware, `utils.py:190-245`) and —
beyond the reference — exporting trained params as a native pretrained pair
(`<name>.json.v1` + `<name>.npz.v1`) that `from_pretrained` can load, so
models trained in this framework are distributable the same way the volpick
weights are.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from volpick_tpu.models import EQTransformer, PhaseNet, TPUPickNet, VolEQTransformer
from volpick_tpu.train.checkpoints import find_best_checkpoint, load_checkpoint

_MODELS = {"phasenet": PhaseNet, "eqtransformer": EQTransformer,
           "voleqtransformer": VolEQTransformer, "tpupicknet": TPUPickNet}


def load_best_model(
    experiment_dir, arch: str, model_args: Optional[dict] = None, prefer_ema: bool = True
) -> Tuple[object, Dict]:
    """(model, params) from an experiment's best checkpoint (min monitored
    loss; the paired -EMA weights when present and prefer_ema).

    Note: EMA with decay 0.999 needs thousands of steps to converge toward
    the trained weights; for short runs (< ~3k steps) pass prefer_ema=False
    or the returned weights will still be dominated by the initialization."""
    model = _MODELS[arch.lower()](**(model_args or {}))
    path = find_best_checkpoint(experiment_dir, prefer_ema=prefer_ema)
    if path is None:
        raise FileNotFoundError(f"no checkpoints under {experiment_dir}")
    template = {"params": model.init(jax.random.PRNGKey(0))}
    raw = load_checkpoint(path)
    from flax import serialization

    params = serialization.from_state_dict(template["params"], raw["params"])
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params


def load_last_model(experiment_dir, arch: str, model_args: Optional[dict] = None):
    model = _MODELS[arch.lower()](**(model_args or {}))
    path = Path(experiment_dir) / "checkpoints" / "last.ckpt"
    raw = load_checkpoint(path)
    from flax import serialization

    params = serialization.from_state_dict(model.init(jax.random.PRNGKey(0)), raw["params"])
    return model, jax.tree_util.tree_map(jnp.asarray, params)


def export_pretrained(
    model,
    params,
    dest_dir,
    name: str = "custom",
    docstring: str = "",
    default_args: Optional[dict] = None,
):
    """Write `<name>.json.v1` + `<name>.npz.v1` under dest_dir/<arch>/."""
    arch = model.name.lower()
    d = Path(dest_dir) / arch
    d.mkdir(parents=True, exist_ok=True)
    cfg = dataclasses.asdict(model)
    cfg.pop("default_args", None)
    cfg.pop("name", None)
    meta = {
        "docstring": docstring,
        "architecture": arch,  # authoritative; key sniffing is the fallback
        "model_args": cfg,
        "version": "1",
        "format": "volpick_tpu_npz",
        "default_args": default_args or dict(model.default_args),
    }
    with open(d / f"{name}.json.v1", "w") as f:
        json.dump(meta, f, indent=2, default=str)
    flat = {}

    def flatten(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                flatten(v, f"{prefix}{k}.")
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                flatten(v, f"{prefix}{i}.")
        else:
            flat[prefix[:-1]] = np.asarray(tree)

    flatten(params)
    # np.savez appends ".npz" to string paths; a file handle avoids that
    with open(d / f"{name}.npz.v1", "wb") as f:
        np.savez(f, **flat)
    return d


def load_pretrained_npz(json_path, npz_path):
    """Load a native pretrained pair → (model, params)."""
    with open(json_path) as f:
        meta = json.load(f)
    margs = dict(meta.get("model_args", {}))
    # tuples serialized as lists
    for k, v in list(margs.items()):
        if isinstance(v, list):
            margs[k] = tuple(v)
    arch = str(meta.get("architecture", "")).lower()
    if arch not in _MODELS:
        # legacy exports carry no architecture field: sniff by kwargs
        # (cannot distinguish the EQT variants — they share kwargs)
        if "d_model" in margs:
            arch = "tpupicknet"
        elif "lstm_blocks" in margs:
            arch = "eqtransformer"
        else:
            arch = "phasenet"
    model = _MODELS[arch](default_args=dict(meta.get("default_args", {})), **margs)
    template = model.init(jax.random.PRNGKey(0))
    data = np.load(npz_path)

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}.") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}.") for i, v in enumerate(tree)]
        return jnp.asarray(data[prefix[:-1]])

    return model, rebuild(template)
