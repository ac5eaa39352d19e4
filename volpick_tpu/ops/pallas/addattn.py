"""Pallas TPU kernel: dense additive (Bahdanau) self-attention in VMEM.

EQTransformer's two transformer blocks use the nonstandard additive
attention e[t,s] = Wa·tanh(x_t·Wt + x_s·Wx + bh) + ba (models/layers.py
seq_self_attention, pinned by the shipped volpick weights). At T=47, U=32,
B=256 the energy tensor costs B·T²·U ≈ 18M tanh per call; the XLA path
keeps U in the minor dimension (25% lane utilization) and spills
intermediates. The per-stage split (docs/TPU_PROBE.jsonl "forward_stages")
prices the two blocks at 0.32 ms of the 1.68 ms batch-256 forward.

This kernel computes a batch-block's whole attention in VMEM: the
(T_q, U, T_s) tanh tensor lives as (T_q·U, T_s) tiles (T_s in lanes), the
Wa contraction and the exact full-row-max softmax never touch HBM, and the
value contraction is one small MXU op per window. The q/k projections stay
OUTSIDE the kernel (large MXU-friendly matmuls XLA already handles).

Numerics are identical to `seq_self_attention` (same full-row max, same
`+eps` denominator) up to reassociation (pinned by tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, x_ref, wa_ref, o_ref, *, eps: float):
    # NOTE: the scalar energy offset `ba` is omitted — a constant shift of
    # every energy cancels exactly under the max-subtracted softmax (the
    # max shifts by the same ba), including through the +eps denominator.
    for bi in range(q_ref.shape[0]):
        q = q_ref[bi]  # (T_q, U), bh pre-folded
        k = k_ref[bi]  # (T_s, U)
        # (T_q, U, T_s): T_s in lanes, U in sublanes
        h = jnp.tanh(q[:, :, None] + k.T[None, :, :])
        e = jnp.sum(h * wa_ref[0][None, :, None], axis=1)  # (T_q, T_s)
        e = e - jnp.max(e, axis=-1, keepdims=True)
        e = jnp.exp(e)
        a = e / (jnp.sum(e, axis=-1, keepdims=True) + eps)
        # out[c, t] = Σ_s x[c, s] · a[t, s]
        o_ref[bi] = jax.lax.dot_general(
            x_ref[bi], a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_b", "interpret"))
def seq_self_attention_pallas(
    x: jnp.ndarray,
    p,
    eps: float = 1e-5,
    block_b: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for `layers.seq_self_attention(x, p)[0]` (full attention,
    values only): x (B, C, T) → (B, C, T)."""
    b, c, t = x.shape
    xt = x.transpose(0, 2, 1)
    q = xt @ p["Wt"] + p["bh"]  # (B, T, U)
    k = xt @ p["Wx"]
    pad = (-b) % block_b
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad,) + q.shape[1:], q.dtype)])
        k = jnp.concatenate([k, jnp.zeros((pad,) + k.shape[1:], k.dtype)])
        x = jnp.concatenate([x, jnp.zeros((pad, c, t), x.dtype)])
    u = q.shape[-1]
    bspec = lambda shape: pl.BlockSpec(
        (block_b,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((q.shape[0], c, t), x.dtype),
        grid=(q.shape[0] // block_b,),
        in_specs=[
            bspec((t, u)),
            bspec((t, u)),
            bspec((c, t)),
            pl.BlockSpec((1, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=bspec((c, t)),
        interpret=interpret,
    )(q, k, x, p["Wa"].reshape(1, u))
    return out[:b] if pad else out
