"""Pallas TPU kernel: fused multi-head self-attention for TPUPickNet.

TPUPickNet's trunk (models/tpupicknet.py) is 4 transformer layers over
T=376 tokens, H=4 heads of Dh=32. The XLA path materializes the
(B, H, T, T) score tensor in HBM three times per layer (QKᵀ write, softmax
read+write, AV read) — ≈ 2.3 GB per 256-window chunk per layer, which makes
inference HBM-bound (~29 k windows/s bf16, docs/TPU_PROBE.jsonl
"classify_archs") despite the MXU-shaped matmuls.

This kernel computes one window's ENTIRE attention in VMEM: scores, softmax
and the value contraction never touch HBM. Layout is head-major-packed
(B, H·Dh, T): all four heads fill the 128 sublanes exactly, so per-head
q/k/v slices are 32-aligned sublane views and nothing is padded. Per grid
step the working set is ~3.5 MB — double-buffered well under VMEM.

Numerics match the jnp path (max-subtracted softmax) to reassociation noise
(pinned by tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, n_heads: int):
    d = q_ref.shape[1]
    dh = d // n_heads
    for bi in range(q_ref.shape[0]):
        for h in range(n_heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh = q_ref[bi, sl, :]  # (Dh, T) — scale pre-folded into q
            kh = k_ref[bi, sl, :]
            vh = v_ref[bi, sl, :]
            s = jax.lax.dot_general(
                qh, kh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T_q, T_kv)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[bi, sl, :] = jax.lax.dot_general(
                vh, p.astype(vh.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)  # (Dh, T_q)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "block_b", "interpret")
)
def mha_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_heads: int,
    block_b: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MHA: q/k/v (B, H·Dh, T) head-major-packed → (B, H·Dh, T).

    Equals softmax(qₕᵀ kₕ) vₕ per head h (softmax over keys). Any query
    scaling must be pre-folded into q. B is padded to a multiple of
    `block_b` internally.
    """
    b, d, t = q.shape
    pad = (-b) % block_b
    if pad:
        zeros = jnp.zeros((pad, d, t), q.dtype)
        q, k, v = (jnp.concatenate([a, zeros]) for a in (q, k, v))
    spec = pl.BlockSpec(
        (block_b, d, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(q.shape[0] // block_b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)
    return out[:b] if pad else out
