"""Pallas TPU kernel: EQTransformer's residual CNN stack, VMEM-resident.

The 7 pre-activation residual blocks run at (B, 64, 47) — tiny maps where the
op-by-op XLA program pays an HBM round-trip per conv (28 convs/BNs). This
kernel keeps the activation tile in VMEM across all 7 blocks:

- eval-mode BatchNorm folds into per-channel affines (g = γ/√(σ²+eps),
  b = β − μ·g) at parameter-pack time;
- each conv is expressed as 3 tap-shifted (TB·47, 64)×(64, 64) matmuls on
  the MXU (kernel-2 convs pack as taps (0, +1) with a zeroed −1 tap, which
  reproduces the keras right-asymmetric 'same' padding);
- one HBM read + write of the tile total, versus ~28 in the unfused path.

Used in eval/classify mode only (training needs batch statistics).

Status: numerically verified against the model's res-CNN section (interpreter
mode, including the published weights). Not wired into the default classify
path: a bounded on-hardware compile attempt (2026-08-16, 40-minute cap,
docs/TPU_PROBE.jsonl "rescnn" stage) confirmed the Mosaic remote compile of
the 42-matmul unrolled body does not finish within practical budgets over
the axon tunnel — the process was killed at the bound. The XLA path is
already a small fraction of the 4 ms/batch forward. Kept as the optimization
seed for local-TPU deployments where compile is cheap.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN_EPS = 1e-3


def fold_res_cnn_params(res_cnn_params: List[Dict]) -> Dict[str, jnp.ndarray]:
    """Pack the model's res_cnn block list into dense tap/affine arrays.

    Returns arrays: w1, w2 (7, 3, C, C) [block, tap(-1,0,+1), in, out],
    cb1, cb2 (7, C) conv biases, g1, b1, g2, b2 (7, C) folded BN affines.
    """
    blocks = res_cnn_params
    nb = len(blocks)
    c = blocks[0]["conv1"]["w"].shape[0]

    def fold_bn(bn):
        g = np.asarray(bn["scale"]) / np.sqrt(np.asarray(bn["var"]) + _BN_EPS)
        b = np.asarray(bn["bias"]) - np.asarray(bn["mean"]) * g
        return g.astype(np.float32), b.astype(np.float32)

    def taps(w):
        """(O, I, K) conv kernel → (3, I, O) taps over offsets (-1, 0, +1)."""
        w = np.asarray(w)
        k = w.shape[-1]
        out = np.zeros((3, w.shape[1], w.shape[0]), dtype=np.float32)
        if k == 3:  # offsets -1, 0, +1
            for i in range(3):
                out[i] = w[:, :, i].T
        elif k == 2:  # right-asym same: y[t] = W0·x[t] + W1·x[t+1]
            out[1] = w[:, :, 0].T
            out[2] = w[:, :, 1].T
        else:
            raise ValueError(f"unsupported res-cnn kernel size {k}")
        return out

    packed = {
        "w1": np.stack([taps(b["conv1"]["w"]) for b in blocks]),
        "w2": np.stack([taps(b["conv2"]["w"]) for b in blocks]),
        "cb1": np.stack([np.asarray(b["conv1"]["b"], np.float32) for b in blocks]),
        "cb2": np.stack([np.asarray(b["conv2"]["b"], np.float32) for b in blocks]),
    }
    g1b1 = [fold_bn(b["norm1"]) for b in blocks]
    g2b2 = [fold_bn(b["norm2"]) for b in blocks]
    packed["g1"] = np.stack([g for g, _ in g1b1])
    packed["b1"] = np.stack([b for _, b in g1b1])
    packed["g2"] = np.stack([g for g, _ in g2b2])
    packed["b2"] = np.stack([b for _, b in g2b2])
    return {k: jnp.asarray(v) for k, v in packed.items()}


def _kernel(x_ref, w1_ref, w2_ref, cb1_ref, cb2_ref, g1_ref, b1_ref, g2_ref, b2_ref, o_ref, *, nb: int):
    # x arrives time-major (TB, T, C): channel contractions are plain 2D
    # matmuls after merging the leading dims (free reshape), no in-kernel
    # relayouts
    x = x_ref[:]
    tb, t, c = x.shape

    def conv3(y, w_taps, bias):
        """Σ_taps shifted (TB·T, C) @ (C, C); tap offsets are (-1, 0, +1)."""
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0)))
        acc = jnp.zeros_like(y)
        for k in range(3):
            seg = yp[:, k : k + t, :].reshape(tb * t, c)
            acc = acc + jnp.dot(seg, w_taps[k], preferred_element_type=jnp.float32).reshape(tb, t, c)
        return acc + bias

    for j in range(nb):
        y = jnp.maximum(x * g1_ref[j] + b1_ref[j], 0.0)
        y = conv3(y, w1_ref[j], cb1_ref[j])
        y = jnp.maximum(y * g2_ref[j] + b2_ref[j], 0.0)
        y = conv3(y, w2_ref[j], cb2_ref[j])
        x = x + y

    o_ref[:] = x


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def res_cnn_stack_pallas(
    x: jnp.ndarray,
    packed: Dict[str, jnp.ndarray],
    tile: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, C, T) float32 → res-CNN stack output, same shape.

    B is padded to a tile multiple internally."""
    b, c, t = x.shape
    nb = packed["w1"].shape[0]
    pad = (-b) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    bp = x.shape[0]
    x_tm = x.transpose(0, 2, 1)  # time-major once, outside the kernel
    kernel = functools.partial(_kernel, nb=nb)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bp, t, c), x.dtype),
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
        ],
        out_specs=pl.BlockSpec((tile, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x_tm,
        packed["w1"], packed["w2"], packed["cb1"], packed["cb2"],
        packed["g1"], packed["b1"], packed["g2"], packed["b2"],
    )
    return out[:b].transpose(0, 2, 1)
