"""Pallas TPU kernel: segmented trigger scan entirely in VMEM.

The two-threshold trigger automaton (obspy ``trigger_onset`` semantics,
reference `volpick/model/eval_taks0.py:46-56`) is a segmented scan over the
probability curve. XLA's ``associative_scan`` lowering round-trips the
full-length state arrays through HBM at every level and its odd/even
interleaving lowers to cross-lane shuffles — measured at ~17.6 ms for
(24, 120k) curves, 45% of the fused classify wall time (docs/TPU_PROBE.jsonl).

This kernel streams the curve through VMEM in chunks: each grid step loads one
(B, L) chunk, runs the log2(L)-level Hillis–Steele scan entirely in VMEM
(``pltpu.roll`` + select; no HBM round trips), folds in the running carry from
the previous chunk, and writes the scanned state. The cross-chunk carry (the
scan state at the last lane + the raw >thres2 flag of the last sample) lives
in VMEM scratch, which persists across the sequential TPU grid.

State per element (see ops/triggers.py): (flag, onset|INT32_MAX, max, argmax).
The kernel takes raw prob + per-row thresholds and computes the element states
itself, so HBM input traffic is just the curve; outputs are the three scanned
fields the pick compaction reads (onset, max, argmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = jnp.iinfo(jnp.int32).max
_NEG = -3.4e38  # effective -inf that survives roll/select lanes


def _shift1(x, fill):
    """Shift right by 1 lane along axis -1, filling lane 0 with `fill` (B, 1)."""
    rolled = pltpu.roll(x, 1, axis=1)
    col0 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) == 0
    return jnp.where(col0, fill, rolled)


def _combine(a, c):
    af, a_on, a_m, a_am = a
    cf, c_on, c_m, c_am = c
    reset = cf > 0
    use_c = c_m > a_m
    m = jnp.where(use_c, c_m, a_m)
    am = jnp.where(use_c, c_am, a_am)
    on = jnp.minimum(a_on, c_on)
    return (
        af | cf,
        jnp.where(reset, c_on, on),
        jnp.where(reset, c_m, m),
        jnp.where(reset, c_am, am),
    )


def _kernel(prob_ref, t1_ref, t2_ref, on_ref, m_ref, am_ref,
            c_on, c_m, c_am, c_prev2, *, chunk: int):
    # grid = (row_blocks, col_chunks); the LAST grid dim is innermost on TPU,
    # so all column chunks of one row block run consecutively and the VMEM
    # carry scratch stays valid; it resets at the first chunk of each block.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        c_on[:] = jnp.full_like(c_on[:], _I32_MAX)
        c_m[:] = jnp.full_like(c_m[:], _NEG)
        c_am[:] = jnp.zeros_like(c_am[:])
        c_prev2[:] = jnp.zeros_like(c_prev2[:])

    x = prob_ref[:]  # (B, L)
    b, l = x.shape
    t1 = t1_ref[:]  # (B, 1)
    t2 = t2_ref[:]
    above2 = (x > t2).astype(jnp.int32)
    above1 = x > t1
    prev2 = _shift1(above2, c_prev2[:, 0:1])
    flag = above2 * (1 - prev2)  # run_start

    col = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)
    pos = col + i * chunk
    in_run = above2 > 0
    m0 = jnp.where(in_run, x, _NEG)
    on0 = jnp.where(above1 & in_run, pos, _I32_MAX)
    state = (flag, on0, m0, pos)

    d = 1
    while d < l:
        colmask = col < d
        rolled = tuple(pltpu.roll(s, d, axis=1) for s in state)
        ident = (
            jnp.where(colmask, 0, rolled[0]),
            jnp.where(colmask, _I32_MAX, rolled[1]),
            jnp.where(colmask, _NEG, rolled[2]),
            jnp.where(colmask, 0, rolled[3]),
        )
        state = _combine(ident, state)
        d *= 2

    # fold in the carry from previous chunks (left operand; its flag is unused)
    prefix = (
        jnp.zeros((b, 1), dtype=jnp.int32),
        c_on[:, 0:1],
        c_m[:, 0:1],
        c_am[:, 0:1],
    )
    _, on, m, am = _combine(prefix, state)

    on_ref[:] = on
    m_ref[:] = m
    am_ref[:] = am
    c_on[:, 0:1] = on[:, l - 1 : l]
    c_m[:, 0:1] = m[:, l - 1 : l]
    c_am[:, 0:1] = am[:, l - 1 : l]
    c_prev2[:, 0:1] = above2[:, l - 1 : l]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def trigger_scan_pallas_raw(
    prob: jnp.ndarray,
    t1: jnp.ndarray,
    t2: jnp.ndarray,
    chunk: int = 4096,
    interpret: bool = False,
):
    """Segmented trigger scan of (B, W) curves with per-row thresholds.

    Returns (onset, max, argmax), each (B, W): the scan state at every
    position; picks are read off at run-end positions by the caller
    (ops/triggers.py). Rows are tiled into blocks of at most 32 (so the VMEM
    block size — and Mosaic's per-op tile count, hence compile time — stays
    bounded no matter how many curves are batched; the eval sweep batches
    n_thresholds x batch = thousands of rows), columns into `chunk`-sample
    blocks scanned sequentially with the carry in VMEM scratch. B is padded
    to a multiple of the row block and W to a multiple of `chunk` internally;
    thresholds broadcast per row.
    """
    b, w = prob.shape
    t1 = jnp.broadcast_to(jnp.asarray(t1, prob.dtype).reshape(-1, 1), (b, 1))
    t2 = jnp.broadcast_to(jnp.asarray(t2, prob.dtype).reshape(-1, 1), (b, 1))
    rb = min(-(-b // 8) * 8, 32)
    bp = -b % rb
    wp = -w % chunk
    if bp or wp:
        prob = jnp.pad(prob, ((0, bp), (0, wp)), constant_values=_NEG)
        t1 = jnp.pad(t1, ((0, bp), (0, 0)), constant_values=1.0)
        t2 = jnp.pad(t2, ((0, bp), (0, 0)), constant_values=1.0)
    bb, ww = prob.shape
    grid = (bb // rb, ww // chunk)
    out_shape = [
        jax.ShapeDtypeStruct((bb, ww), jnp.int32),
        jax.ShapeDtypeStruct((bb, ww), prob.dtype),
        jax.ShapeDtypeStruct((bb, ww), jnp.int32),
    ]
    blk = lambda r, c: (r, c)
    row = lambda r, c: (r, 0)
    on, m, am = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, chunk), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, chunk), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, chunk), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, chunk), blk, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, 128), jnp.int32),
            pltpu.VMEM((rb, 128), prob.dtype),
            pltpu.VMEM((rb, 128), jnp.int32),
            pltpu.VMEM((rb, 128), jnp.int32),
        ],
        interpret=interpret,
    )(prob, t1, t2)
    return on[:b, :w], m[:b, :w], am[:b, :w]
