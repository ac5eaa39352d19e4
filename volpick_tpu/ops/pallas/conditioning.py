"""Pallas TPU kernel: fused per-window conditioning (detrend/demean + norm).

One VMEM pass per window tile computes the mean, the least-squares linear
trend (closed form over centered coordinates), and the per-channel peak/std
scale, then writes the conditioned window. The reference runs this
per-sample in numpy loader workers.

Measured on real TPU (v5e via axon, 2026-08-16, docs/TPU_PROBE.jsonl):
compiles and matches the jnp path to 2.4e-7, but XLA's own fusion of the
ops.signal formulation is FASTER — 570 GB/s effective r/w vs 452-525 GB/s
for this kernel across tiles 8..128 (XLA fuses the reductions into a
single pass already; Mosaic's pipelining here adds overhead). Hence
`WaveformPicker(use_pallas=False)` remains the default; the kernel is kept
as a verified baseline for future Mosaic revisions. CPU tests run it in
interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref, *, detrend: bool, norm: str, eps: float):
    x = x_ref[:]  # (TB, C, W)
    w = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    if detrend:
        # TPU iota must be integer-typed; cast after
        t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2).astype(jnp.float32) - (w - 1) / 2.0
        var_t = w * (w * w - 1) / 12.0  # Σ t² for centered integer coordinates
        slope = jnp.sum((x - mean) * t, axis=-1, keepdims=True) / var_t
        x = x - mean - slope * t
    else:
        x = x - mean
    if norm == "peak":
        scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    else:
        scale = jnp.std(x, axis=-1, keepdims=True)
    o_ref[:] = x / (scale + eps)


@functools.partial(
    jax.jit, static_argnames=("detrend", "norm", "tile", "eps", "interpret")
)
def condition_windows_pallas(
    x: jnp.ndarray,
    detrend: bool = False,
    norm: str = "peak",
    tile: int = 8,
    eps: float = 1e-10,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, C, W) float32 windows → conditioned windows, same shape.

    B must be a multiple of `tile` (the fused classify path pads batches)."""
    b, c, w = x.shape
    if b % tile != 0:
        raise ValueError(f"batch {b} must be a multiple of tile {tile}")
    kernel = functools.partial(_kernel, detrend=detrend, norm=norm, eps=eps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, c, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tile, c, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
