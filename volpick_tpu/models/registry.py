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
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from volpick_tpu.models.eqtransformer import EQTransformer
from volpick_tpu.models.phasenet import PhaseNet
from volpick_tpu.models.torch_import import import_eqtransformer, import_phasenet

_ARCHS = {"phasenet": PhaseNet, "eqtransformer": EQTransformer}

_DEFAULT_SEARCH = [
    os.environ.get("VOLPICK_TPU_MODELS", ""),
    os.path.expanduser("~/.cache/volpick_tpu/models"),
]


def _find(arch: str, name: str, search_paths: Sequence[str]) -> Tuple[str, str]:
    for base in list(search_paths) + _DEFAULT_SEARCH:
        if not base:
            continue
        d = os.path.join(base, arch)
        js = os.path.join(d, f"{name}.json.v1")
        pt = os.path.join(d, f"{name}.pt.v1")
        if os.path.exists(js) and os.path.exists(pt):
            return js, pt
        # also accept flat layout <base>/<name>.{json,pt}.v1
        js2 = os.path.join(base, f"{name}.json.v1")
        pt2 = os.path.join(base, f"{name}.pt.v1")
        if os.path.exists(js2) and os.path.exists(pt2):
            return js2, pt2
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
    js_path, pt_path = _find(arch, name, search_paths)
    with open(js_path) as f:
        meta = json.load(f)
    model_args = dict(meta.get("model_args", {}))
    model_args.pop("sampling_rate", None)
    model = _ARCHS[arch](default_args=dict(meta.get("default_args", {})), **model_args)
    if arch == "phasenet":
        params = import_phasenet(pt_path)
    else:
        params = import_eqtransformer(pt_path)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype=dtype), params)
    return model, params


def load_model(arch: str, seed: int = 0, **model_args):
    """Fresh (randomly initialized) model. Returns (model, params)."""
    arch = arch.lower()
    model = _ARCHS[arch](**model_args)
    params = model.init(jax.random.PRNGKey(seed))
    return model, params
