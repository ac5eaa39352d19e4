"""PhaseNet (Zhu & Beroza 2019) 1D U-Net in functional JAX.

Architecture pinned by the shipped volpick weights
(`/root/reference/Final_models/volpick/phasenet/volpick.pt.v1`, SURVEY §2.5):
3→8 'inc' conv (k7) + BN, 5 down stages (same-conv k7 + BN + strided conv k7
stride 4 + BN; channels 8/16/32/64/128), 4 up stages (transposed conv k7
stride 4 + BN + same-conv over concat[skip, x] + BN), 1×1 output conv,
softmax over classes (P, S, N). Window 3001 samples @ 100 Hz, ZNE input.

Stride-4 stages use the asymmetric manual pads of the original TF
implementation — (3,3) at stage 0 via symmetric conv padding, then (2,3),
(1,3), (2,3) before stages 1-3 — and up stages center-crop the upsampled map
to the skip length before concatenation. BatchNorm eps is 1e-3 (TF default
the torch port preserves). These choices reproduce the reference forward pass
sample-for-sample (see tests/test_model_parity.py against the torch oracle).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from volpick_tpu.models.layers import (
    batch_norm,
    conv1d,
    conv1d_same,
    conv_transpose1d,
)

# Manual left/right pads before the stride-4 convs of stages 1..3
_DOWN_PADS = {1: (2, 3), 2: (1, 3), 3: (2, 3)}
_BN_EPS = 1e-3


@dataclasses.dataclass
class PhaseNet:
    """Config + functional apply/init for the PhaseNet trunk."""

    in_channels: int = 3
    classes: int = 3
    phases: str = "PSN"
    norm: str = "peak"
    sampling_rate: float = 100.0
    in_samples: int = 3001
    depth: int = 5
    kernel_size: int = 7
    stride: int = 4
    filters_root: int = 8
    component_order: str = "ZNE"
    default_args: dict = dataclasses.field(default_factory=dict)
    name: str = "PhaseNet"

    # ---- label conventions -------------------------------------------------
    @property
    def labels(self) -> str:
        return self.phases

    @property
    def pred_sample_rate(self) -> float:
        return self.sampling_rate

    # ---- parameters ---------------------------------------------------------
    def init(self, key: jax.Array) -> Dict:
        """He-uniform initialized parameter tree (BN stats at identity)."""
        keys = iter(jax.random.split(key, 64))

        def conv(o, i, k, bias=True):
            fan_in = i * k
            bound = float(np.sqrt(6.0 / fan_in))
            p = {"w": jax.random.uniform(next(keys), (o, i, k), jnp.float32, -bound, bound)}
            if bias:
                p["b"] = jnp.zeros((o,), jnp.float32)
            return p

        def bn(c):
            return {
                "scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32),
                "mean": jnp.zeros((c,), jnp.float32),
                "var": jnp.ones((c,), jnp.float32),
            }

        fr, ks = self.filters_root, self.kernel_size
        params: Dict = {
            "inc": conv(fr, self.in_channels, ks),
            "in_bn": bn(fr),
            "down": [],
            "up": [],
            "out": conv(self.classes, fr, 1),
        }
        last = fr
        filters_per_stage = []
        for i in range(self.depth):
            filters = int(2**i * fr)
            filters_per_stage.append(filters)
            stage = {"conv_same": conv(filters, last, ks, bias=False), "bn1": bn(filters)}
            last = filters
            if i < self.depth - 1:
                stage["conv_down"] = conv(filters, filters, ks, bias=False)
                stage["bn2"] = bn(filters)
            params["down"].append(stage)
        for i in range(self.depth - 1):
            filters = int(2 ** (self.depth - 2 - i) * fr)
            stage = {
                # stored pre-flipped/(O,I,K), ready for conv_transpose1d
                "conv_up": conv(filters, last, ks, bias=False),
                "bn1": bn(filters),
                "conv_same": conv(filters, 2 * filters, ks, bias=False),
                "bn2": bn(filters),
            }
            last = filters
            params["up"].append(stage)
        return params

    # ---- forward ------------------------------------------------------------
    def apply(
        self,
        params: Dict,
        x: jnp.ndarray,
        train: bool = False,
        logits: bool = False,
    ):
        """Forward pass. x: (B, C, 3001) → (B, classes, 3001) probabilities.

        In train mode returns (y, bn_updates) where bn_updates mirrors the
        param tree structure with updated BatchNorm running stats.
        """
        updates: Dict = {}

        def bn(h, p, path):
            y, u = batch_norm(h, p, train=train, eps=_BN_EPS)
            if u is not None:
                updates[path] = u
            return y

        act = jax.nn.relu
        h = act(bn(conv1d_same(x, params["inc"]["w"], params["inc"]["b"]), params["in_bn"], "in_bn"))

        skips: List[jnp.ndarray] = []
        for i, stage in enumerate(params["down"]):
            h = act(bn(conv1d_same(h, stage["conv_same"]["w"]), stage["bn1"], f"down.{i}.bn1"))
            if "conv_down" in stage:
                skips.append(h)
                if i in _DOWN_PADS:
                    l, r = _DOWN_PADS[i]
                    h = jnp.pad(h, ((0, 0), (0, 0), (l, r)))
                    pad = (0, 0)
                else:
                    pad = (self.kernel_size // 2, self.kernel_size // 2)
                h = conv1d(h, stage["conv_down"]["w"], stride=self.stride, padding=pad)
                h = act(bn(h, stage["bn2"], f"down.{i}.bn2"))

        for i, (stage, skip) in enumerate(zip(params["up"], skips[::-1])):
            h = conv_transpose1d(h, stage["conv_up"]["w"], stride=self.stride, k=self.kernel_size)
            h = act(bn(h, stage["bn1"], f"up.{i}.bn1"))
            offset = (h.shape[-1] - skip.shape[-1]) // 2
            h = jnp.concatenate([skip, h[..., offset : offset + skip.shape[-1]]], axis=1)
            h = act(bn(conv1d_same(h, stage["conv_same"]["w"]), stage["bn2"], f"up.{i}.bn2"))

        h = conv1d(h, params["out"]["w"], params["out"]["b"])
        if not logits:
            h = jax.nn.softmax(h, axis=1)
        if train:
            return h, updates
        return h

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)
