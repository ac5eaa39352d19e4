"""Pretrained-model registry: name → (model config, params).

Replaces the SeisBench `from_pretrained("volpick")` surface the reference
documents (reference `README.md:29-47`). Weight files are the published
`volpick.{json,pt}.v1` pairs; search order:

1. $VOLPICK_TPU_MODELS/<arch>/<name>.{json,pt}.v1
2. ~/.cache/volpick_tpu/models/<arch>/<name>.{json,pt}.v1
3. any extra directories passed via `search_paths`
"""

from __future__ import annotations

import json
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from volpick_tpu.models.eqtransformer import EQTransformer, VolEQTransformer
from volpick_tpu.models.phasenet import PhaseNet
from volpick_tpu.models.tpupicknet import TPUPickNet
from volpick_tpu.models.torch_import import import_eqtransformer, import_phasenet

_ARCHS = {"phasenet": PhaseNet, "eqtransformer": EQTransformer,
          "voleqtransformer": VolEQTransformer, "tpupicknet": TPUPickNet}

_DEFAULT_SEARCH = [
    os.environ.get("VOLPICK_TPU_MODELS", ""),
    os.path.expanduser("~/.cache/volpick_tpu/models"),
]


def _find(arch: str, name: str, search_paths: Sequence[str]) -> Tuple[str, str, str]:
    """Returns (json_path, weights_path, kind) with kind 'torch' (.pt.v1) or
    'npz' (native .npz.v1 written by train.model_io.export_pretrained)."""
    for base in list(search_paths) + _DEFAULT_SEARCH:
        if not base:
            continue
        for d in (os.path.join(base, arch), base):
            js = os.path.join(d, f"{name}.json.v1")
            if not os.path.exists(js):
                continue
            pt = os.path.join(d, f"{name}.pt.v1")
            if os.path.exists(pt):
                return js, pt, "torch"
            npz = os.path.join(d, f"{name}.npz.v1")
            if os.path.exists(npz):
                return js, npz, "npz"
    raise FileNotFoundError(
        f"pretrained weights {name!r} for {arch!r} not found in "
        f"{list(search_paths) + _DEFAULT_SEARCH}; set VOLPICK_TPU_MODELS"
    )


def from_pretrained(
    arch: str,
    name: str = "volpick",
    search_paths: Sequence[str] = (),
    dtype=jnp.float32,
):
    """Load a pretrained model. Returns (model, params).

    `model.default_args` carries the shipped thresholds (e.g. PhaseNet
    P_threshold 0.39 / S_threshold 0.34)."""
    arch = arch.lower()
    if arch not in _ARCHS:
        raise ValueError(f"unknown architecture {arch!r}; available: {sorted(_ARCHS)}")
    js_path, weights_path, kind = _find(arch, name, search_paths)
    if kind == "npz":
        from volpick_tpu.train.model_io import load_pretrained_npz

        model, params = load_pretrained_npz(js_path, weights_path)
        return model, jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype=dtype), params)
    with open(js_path) as f:
        meta = json.load(f)
    model_args = dict(meta.get("model_args", {}))
    model_args.pop("sampling_rate", None)
    model = _ARCHS[arch](default_args=dict(meta.get("default_args", {})), **model_args)
    if arch == "phasenet":
        params = import_phasenet(weights_path)
    else:
        params = import_eqtransformer(weights_path)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype=dtype), params)
    return model, params


def load_model(arch: str, seed: int = 0, **model_args):
    """Fresh (randomly initialized) model. Returns (model, params)."""
    arch = arch.lower()
    model = _ARCHS[arch](**model_args)
    params = model.init(jax.random.PRNGKey(seed))
    return model, params
