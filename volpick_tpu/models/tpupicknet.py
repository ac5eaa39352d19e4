"""TPUPickNet: a TPU-native phase-picking architecture (beyond the reference).

PhaseNet (8-128 channels) and EQTransformer (8-64 channels) under-fill the
TPU's 128×128 MXU by design — they were sized for 2019-era GPUs. TPUPickNet
is a picker built for the MXU:

- patch embedding: strided conv to 128 channels at 1/8 resolution
  (3008 → 376 tokens), all matmul dims multiples of 128;
- a stack of pre-norm transformer blocks (multi-head attention d=128,
  heads=4, MLP 128→512→128) over the token sequence — long-range context
  like EQT's transformer but with MXU-shaped matmuls instead of 16-wide
  additive attention;
- a light transposed-conv decoder back to full resolution;
- P/S/N softmax output, PhaseNet-compatible losses/labels/picking, so the
  whole training/eval/classify stack works unchanged.

~1.8M params — still small, but each matmul tile is full. Trains with the
same config schema ("model": "TPUPickNet").
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from volpick_tpu.models.layers import conv1d, conv1d_same, conv_transpose1d, layer_norm_keras


def _layer_norm(x, scale, bias, eps=1e-6):
    # x: (B, T, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


@dataclasses.dataclass
class TPUPickNet:
    in_channels: int = 3
    in_samples: int = 3008  # divisible by the 8× patch stride
    classes: int = 3
    phases: str = "PSN"
    norm: str = "peak"
    sampling_rate: float = 100.0
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 4
    mlp_ratio: int = 4
    patch_stride: int = 8
    component_order: str = "ZNE"
    default_args: dict = dataclasses.field(default_factory=dict)
    name: str = "TPUPickNet"

    @property
    def labels(self) -> str:
        return self.phases

    @property
    def n_tokens(self) -> int:
        return self.in_samples // self.patch_stride

    # ---- parameters ----------------------------------------------------------
    def init(self, key: jax.Array) -> Dict:
        keys = iter(jax.random.split(key, 128))
        d = self.d_model

        def dense(i, o, scale=None):
            s = scale if scale is not None else float(np.sqrt(2.0 / i))
            return {
                "w": jax.random.normal(next(keys), (i, o), jnp.float32) * s,
                "b": jnp.zeros((o,), jnp.float32),
            }

        def conv(o, i, k):
            bound = float(np.sqrt(6.0 / (i * k)))
            return {
                "w": jax.random.uniform(next(keys), (o, i, k), jnp.float32, -bound, bound),
                "b": jnp.zeros((o,), jnp.float32),
            }

        def ln():
            return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}

        blocks = []
        for _ in range(self.n_layers):
            blocks.append(
                {
                    "ln1": ln(),
                    "qkv": dense(d, 3 * d, scale=float(np.sqrt(1.0 / d))),
                    "proj": dense(d, d, scale=float(np.sqrt(1.0 / d))),
                    "ln2": ln(),
                    "mlp1": dense(d, self.mlp_ratio * d),
                    "mlp2": dense(self.mlp_ratio * d, d, scale=float(np.sqrt(1.0 / (self.mlp_ratio * d)))),
                }
            )
        return {
            # two stride-(patch/2) convs: 3 → d/2 → d
            "embed1": conv(d // 2, self.in_channels, 7),
            "embed2": conv(d, d // 2, 7),
            "pos": jax.random.normal(next(keys), (self.n_tokens, d), jnp.float32) * 0.02,
            "blocks": blocks,
            "ln_f": ln(),
            # decoder: two 4× upsampling transposed convs (stored OIK flipped)
            "up1": conv(d // 2, d, 8),
            "up2": conv(d // 4, d // 2, 8),
            "out": conv(self.classes, d // 4, 7),
        }

    # ---- forward --------------------------------------------------------------
    def apply(
        self,
        params: Dict,
        x: jnp.ndarray,
        train: bool = False,
        logits: bool = False,
        attn: Optional[str] = None,
    ):
        """x: (B, 3, in_samples) → (B, classes, in_samples) probabilities.

        `attn` selects the attention implementation: "xla" (einsum scores in
        HBM) or "pallas" (ops/pallas/attention.py — one window's whole
        attention fused in VMEM, no HBM score tensor). Default: the env knob
        `VOLPICK_TPN_ATTN`, else "pallas" on a TPU backend ("classify_chunks"
        sweep, docs/TPU_PROBE.jsonl r4: fused classify 36.8k vs 18.3k
        windows/s at the per-chunk optimum — the VMEM kernel doubles the
        end-to-end rate) and "xla" elsewhere (CPU tests would pay interpret
        mode; equality is pinned by tests/test_pallas.py). Inference-only;
        train mode always uses the XLA path (it is differentiable and the
        bound there is the backward pass, not score traffic).
        """
        if attn is None:
            attn = os.environ.get("VOLPICK_TPN_ATTN", "").strip().lower() or (
                "pallas" if jax.default_backend() == "tpu" else "xla"
            )
        if attn not in ("xla", "pallas"):
            raise ValueError(f"unknown attn implementation: {attn!r}")
        if train:
            attn = "xla"
        b = x.shape[0]
        d = self.d_model
        s = self.patch_stride
        half = s // 2  # stride per embedding conv (8 = 4 × 2? use 4 then 2)

        h = conv1d(x, params["embed1"]["w"], params["embed1"]["b"], stride=4, padding=(3, 3))
        h = jax.nn.gelu(h)
        h = conv1d(h, params["embed2"]["w"], params["embed2"]["b"], stride=2, padding=(3, 3))
        # (B, D, T) → (B, T, D)
        h = h.transpose(0, 2, 1) + params["pos"][None]

        # python float (weak type): a np.float64 scalar here would promote the
        # whole attention graph to float32 and break bf16 inference.
        scale = float(1.0 / np.sqrt(d // self.n_heads))
        t = h.shape[1]
        for blk in params["blocks"]:
            y = _layer_norm(h, blk["ln1"]["scale"], blk["ln1"]["bias"])
            qkv = y @ blk["qkv"]["w"] + blk["qkv"]["b"]  # (B, T, 3D)
            qkv = qkv.reshape(b, t, 3, self.n_heads, d // self.n_heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, T, H, Dh)
            if attn == "pallas":
                from volpick_tpu.ops.pallas.attention import mha_pallas

                # head-major packing (B, H·Dh, T); scale folded into q
                to_pk = lambda a: a.transpose(0, 2, 3, 1).reshape(b, d, t)
                y = mha_pallas(
                    to_pk(q) * scale, to_pk(k), to_pk(v), self.n_heads,
                    interpret=jax.default_backend() != "tpu",
                ).transpose(0, 2, 1)  # (B, T, D), same h·Dh ordering
            else:
                att = jnp.einsum("bthd,bshd->bhts", q, k) * scale
                att = jax.nn.softmax(att, axis=-1)
                y = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, t, d)
            h = h + y @ blk["proj"]["w"] + blk["proj"]["b"]
            y = _layer_norm(h, blk["ln2"]["scale"], blk["ln2"]["bias"])
            y = jax.nn.gelu(y @ blk["mlp1"]["w"] + blk["mlp1"]["b"])
            h = h + y @ blk["mlp2"]["w"] + blk["mlp2"]["b"]

        h = _layer_norm(h, params["ln_f"]["scale"], params["ln_f"]["bias"])
        h = h.transpose(0, 2, 1)  # (B, D, T)
        # decoder: 4× then 2× transposed convs back to full resolution
        h = jax.nn.gelu(
            conv_transpose1d(h, params["up1"]["w"], stride=4, k=8, padding=2)
            + params["up1"]["b"][None, :, None]
        )
        h = jax.nn.gelu(
            conv_transpose1d(h, params["up2"]["w"], stride=2, k=8, padding=3)
            + params["up2"]["b"][None, :, None]
        )
        h = conv1d_same(h, params["out"]["w"], params["out"]["b"])
        h = h[..., : self.in_samples]
        if not logits:
            h = jax.nn.softmax(h, axis=1)
        if train:
            return h, {}  # no batch-norm state
        return h

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)
