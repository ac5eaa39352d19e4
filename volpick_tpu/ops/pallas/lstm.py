"""Pallas TPU kernel: multi-branch LSTM recurrence in ONE kernel launch.

The EQTransformer trunk runs 8 sequential 47-step LSTM scans per forward
(3 BiLSTM blocks × 2 directions + 2 pick branches; reference architecture
`EqT_model2.py` via the shipped volpick weights — see models/eqtransformer.py).
Each `lax.scan` step is a tiny (B,16)×(16,64) matmul plus elementwise gates:
far too small to occupy the MXU/VPU, so the scans are bound by per-iteration
loop overhead, not FLOPs (docs/TPU_PROBE.jsonl "forward_stages").

This kernel runs G independent recurrences (a BiLSTM's two directions, or
the P/S pick LSTMs) inside one `pallas_call`:

- the per-timestep input projections are hoisted OUTSIDE the kernel into one
  big MXU-friendly einsum over all T (exactly as `layers.lstm_multi` does);
- state is packed gate-major: gates live as a (4·G·H, B) block — for G=2,
  H=16 the recurrent matmul is a single (128, 32)×(32, B) MXU op per step
  and every gate slice is an 8-aligned sublane slice;
- the whole (T, 4GH, B) projected input, the (T, GH, B) output sequence,
  and the recurrent weights stay resident in VMEM for all T steps — one
  kernel launch replaces T scan iterations of XLA loop overhead.

Numerics are identical to `layers.lstm_multi` up to reassociation (pinned by
tests/test_pallas.py). Reverse directions are handled by the caller flipping
inputs/outputs, as in `layers.bilstm(fused=True)`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, whh_ref, out_ref, h_ref, c_ref):
    gh = h_ref.shape[0]
    t = xp_ref.shape[0]
    h_ref[:] = jnp.zeros_like(h_ref)
    c_ref[:] = jnp.zeros_like(c_ref)

    def step(ti, _):
        xp = xp_ref[pl.ds(ti, 1)][0]  # (4GH, B)
        gates = xp + jnp.dot(
            whh_ref[:], h_ref[:], preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(gates[0:gh])
        f = jax.nn.sigmoid(gates[gh : 2 * gh])
        g = jnp.tanh(gates[2 * gh : 3 * gh])
        o = jax.nn.sigmoid(gates[3 * gh : 4 * gh])
        cell = f * c_ref[:] + i * g
        c_ref[:] = cell
        hn = o * jnp.tanh(cell)
        h_ref[:] = hn
        out_ref[pl.ds(ti, 1)] = hn[None]
        return 0

    jax.lax.fori_loop(0, t, step, 0)


def _pack_whh(w_hh: jnp.ndarray) -> jnp.ndarray:
    """(G, 4H, H) per-branch recurrent weights → (4GH, GH) gate-major
    block matrix: row (k, g, u) = gate k of branch g unit u; col (g', v)
    nonzero only for g' == g. The structural zeros ride the same padded
    MXU tile, so they are free at GH ≤ 128."""
    g, four_h, h = w_hh.shape
    w = jnp.zeros((4, g, h, g, h), w_hh.dtype)
    wr = w_hh.reshape(g, 4, h, h)  # (G, gate, H_out, H_in)
    for gi in range(g):
        w = w.at[:, gi, :, gi, :].set(wr[gi])
    return w.reshape(4 * g * h, g * h)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_multi_pallas(
    xs: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for `layers.lstm_multi`: xs (G, B, C, T) → (G, B, H, T).

    w_ih (G, 4H, C), w_hh (G, 4H, H), bias (G, 4H) with torch gate order
    (i, f, g, o); each branch g computes exactly
    ``layers.lstm(xs[g], w_ih[g], w_hh[g], ...)``.
    """
    g, b, c, t = xs.shape
    h = w_hh.shape[-1]
    gh = g * h

    # one big input projection over all T (MXU), packed gate-major:
    # (T, gate, G, H, B) → (T, 4GH, B)
    proj = jnp.einsum("gkc,gbct->tgkb", w_ih, xs) + bias[None, :, :, None]
    proj = proj.reshape(t, g, 4, h, b).transpose(0, 2, 1, 3, 4)
    xp = proj.reshape(t, 4 * gh, b)
    whh = _pack_whh(w_hh)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((t, gh, b), xs.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((gh, b), jnp.float32),
            pltpu.VMEM((gh, b), jnp.float32),
        ],
        interpret=interpret,
    )(xp, whh)

    # (T, GH, B) → (G, B, H, T)
    return out.reshape(t, g, h, b).transpose(1, 3, 2, 0)
