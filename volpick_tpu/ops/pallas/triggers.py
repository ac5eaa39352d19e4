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


def _extract_kernel(prob_ref, t1_ref, t2_ref,
                    pi_ref, pv_ref, on_ref, off_ref, cnt_ref,
                    c_on, c_m, c_am, c_prev2, s_cnt, s_pi, s_pv, s_on, s_off,
                    *, chunk: int, kp: int):
    """Full trigger extraction in one kernel: the segmented scan of
    ``_kernel`` plus in-VMEM pick emission. Instead of writing the three
    (B, W) scanned-state arrays back to HBM for an XLA-side top_k
    compaction, each chunk emits its finished runs directly into (B, K)
    accumulator tiles held in VMEM scratch — so HBM traffic is the input
    curve plus the fixed-size pick buffers, and the top_k/sort disappears.

    Emission rule (oracle semantics, ops/triggers.py): a pick is emitted at
    each run end whose run has seen a >thres1 sample. A run end at the
    chunk's last lane is deferred — the next chunk detects it from the
    carried state (c_prev2 & ~above2[0]) and emits from the carry. The
    wrapper always pads at least one column beyond the real stream so the
    final run closes inside the padded region.

    The emission while_loop runs max-emissions-per-row-per-chunk iterations
    (a few vector selects/reduces each). Seismic probability curves emit a
    handful of picks per 20-minute window, so the loop is near-free in
    production; pathological dense curves (a run every few samples) degrade
    toward serial and should use the scan+top_k methods instead.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        c_on[:] = jnp.full_like(c_on[:], _I32_MAX)
        c_m[:] = jnp.full_like(c_m[:], _NEG)
        c_am[:] = jnp.zeros_like(c_am[:])
        c_prev2[:] = jnp.zeros_like(c_prev2[:])
        s_cnt[:] = jnp.zeros_like(s_cnt[:])
        s_pi[:] = jnp.full_like(s_pi[:], -1)
        s_pv[:] = jnp.zeros_like(s_pv[:])
        s_on[:] = jnp.full_like(s_on[:], -1)
        s_off[:] = jnp.full_like(s_off[:], -1)

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

    prefix = (
        jnp.zeros((b, 1), dtype=jnp.int32),
        c_on[:, 0:1],
        c_m[:, 0:1],
        c_am[:, 0:1],
    )
    _, on, m, am = _combine(prefix, state)

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (b, kp), 1)

    def put(has, k_idx, am_j, m_j, on_j, off_j):
        mk = has[:, None] & (iota_k == k_idx[:, None])
        s_pi[:] = jnp.where(mk, am_j[:, None], s_pi[:])
        s_pv[:] = jnp.where(mk, m_j[:, None], s_pv[:])
        s_on[:] = jnp.where(mk, on_j[:, None], s_on[:])
        s_off[:] = jnp.where(mk, off_j[:, None], s_off[:])
        s_cnt[:, 0:1] = s_cnt[:, 0:1] + has[:, None].astype(jnp.int32)

    # 1) deferred emission: previous chunk ended mid-lane on a run end
    ce = (
        (c_prev2[:, 0] > 0)
        & (above2[:, 0] == 0)
        & (c_on[:, 0] < _I32_MAX)
    )
    put(ce, s_cnt[:, 0], c_am[:, 0], c_m[:, 0], c_on[:, 0],
        jnp.full((b,), i * chunk - 1, jnp.int32))

    # 2) in-chunk emissions (lanes 0..L-2; the last lane defers to carry).
    # The loop carry is an int32 mask (i1 vector carries are fragile in
    # Mosaic); each iteration peels the first remaining emission per row.
    lastcol = col == (l - 1)
    nxt = jnp.where(lastcol, 1, pltpu.roll(above2, l - 1, axis=1))  # shift left 1
    emit = ((in_run & (nxt == 0) & (on < _I32_MAX))).astype(jnp.int32)

    def cond(mask):
        return jnp.sum(mask) > 0

    def body(mask):
        p_first = jnp.min(jnp.where(mask > 0, pos, _I32_MAX), axis=1)  # (B,)
        has = p_first < _I32_MAX
        sel = (mask > 0) & (pos == p_first[:, None])
        on_j = jnp.sum(jnp.where(sel, on, 0), axis=1)
        m_j = jnp.sum(jnp.where(sel, m, 0.0), axis=1)
        am_j = jnp.sum(jnp.where(sel, am, 0), axis=1)
        put(has, s_cnt[:, 0], am_j, m_j, on_j, p_first)
        return mask * (1 - sel.astype(jnp.int32))

    jax.lax.while_loop(cond, body, emit)

    # accumulators → HBM pick buffers (cheap; keeps every out block written)
    pi_ref[:] = s_pi[:]
    pv_ref[:] = s_pv[:]
    on_ref[:] = s_on[:]
    off_ref[:] = s_off[:]
    cnt_ref[:] = s_cnt[:]

    c_on[:, 0:1] = on[:, l - 1 : l]
    c_m[:, 0:1] = m[:, l - 1 : l]
    c_am[:, 0:1] = am[:, l - 1 : l]
    c_prev2[:, 0:1] = above2[:, l - 1 : l]


@functools.partial(jax.jit, static_argnames=("max_picks", "chunk", "interpret"))
def trigger_extract_pallas(
    prob: jnp.ndarray,
    t1: jnp.ndarray,
    t2: jnp.ndarray,
    max_picks: int = 32,
    chunk: int = 4096,
    interpret: bool = False,
):
    """Scan + pick emission fused in one Pallas kernel.

    Returns (peak_idx, peak_val, valid, onset_idx, offset_idx), each
    (B, max_picks), identical to ``ops.triggers.extract_triggers_batched``
    semantics (earliest max_picks picks per row, time-ordered, invalid
    entries idx=-1/val=0). HBM traffic is the input curve plus the pick
    buffers — the (B, W) scanned state never leaves VMEM.
    """
    b, w = prob.shape
    t1 = jnp.broadcast_to(jnp.asarray(t1, prob.dtype).reshape(-1, 1), (b, 1))
    t2 = jnp.broadcast_to(jnp.asarray(t2, prob.dtype).reshape(-1, 1), (b, 1))
    rb = min(-(-b // 8) * 8, 32)
    bp = -b % rb
    wp = -w % chunk
    if wp == 0:
        wp = chunk  # ≥1 padded column so the final run closes in-kernel
    prob = jnp.pad(prob, ((0, bp), (0, wp)), constant_values=_NEG)
    if bp:
        t1 = jnp.pad(t1, ((0, bp), (0, 0)), constant_values=1.0)
        t2 = jnp.pad(t2, ((0, bp), (0, 0)), constant_values=1.0)
    bb, ww = prob.shape
    kp = -(-max_picks // 128) * 128
    n_chunks = ww // chunk
    grid = (bb // rb, n_chunks)
    out_shape = [
        jax.ShapeDtypeStruct((bb, kp), jnp.int32),
        jax.ShapeDtypeStruct((bb, kp), prob.dtype),
        jax.ShapeDtypeStruct((bb, kp), jnp.int32),
        jax.ShapeDtypeStruct((bb, kp), jnp.int32),
        jax.ShapeDtypeStruct((bb, 128), jnp.int32),
    ]
    blk = lambda r, c: (r, c)
    row = lambda r, c: (r, 0)
    kspec = pl.BlockSpec((rb, kp), row, memory_space=pltpu.VMEM)
    pi, pv, on, off, cnt = pl.pallas_call(
        functools.partial(_extract_kernel, chunk=chunk, kp=kp),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, chunk), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[kspec, kspec, kspec, kspec,
                   pl.BlockSpec((rb, 128), row, memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((rb, 128), jnp.int32),
            pltpu.VMEM((rb, 128), prob.dtype),
            pltpu.VMEM((rb, 128), jnp.int32),
            pltpu.VMEM((rb, 128), jnp.int32),
            pltpu.VMEM((rb, 128), jnp.int32),
            pltpu.VMEM((rb, kp), jnp.int32),
            pltpu.VMEM((rb, kp), prob.dtype),
            pltpu.VMEM((rb, kp), jnp.int32),
            pltpu.VMEM((rb, kp), jnp.int32),
        ],
        interpret=interpret,
    )(prob, t1, t2)
    pi, pv, on, off = (a[:b, :max_picks] for a in (pi, pv, on, off))
    count = jnp.minimum(cnt[:b, 0], max_picks)
    valid = jax.lax.broadcasted_iota(jnp.int32, (b, max_picks), 1) < count[:, None]
    return (
        jnp.where(valid, pi, -1),
        jnp.where(valid, pv, 0.0).astype(prob.dtype),
        valid,
        jnp.where(valid, on, -1),
        jnp.where(valid, off, -1),
    )


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
