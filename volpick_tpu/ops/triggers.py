"""Two-threshold hysteresis trigger + peak extraction, vectorized for device.

The reference extracts picks with obspy's ``trigger_onset(prob, thr, thr/2)``
followed by an argmax per trigger (reference `volpick/model/eval_taks0.py:46-56`),
a sequential Python loop per trace. The semantics reduce to a run-based rule:

  For each maximal run of samples with prob > thres2, if the run contains at
  least one sample with prob > thres1, emit one trigger
  [first index in run with pron > thres1, last index of run], and the pick is
  argmax(prob[on:off]) (off exclusive) with its probability value.

Key algebraic fact exploited here: within a run, every sample BEFORE the onset
has prob <= thres1 while the onset sample has prob > thres1, so the max over
the whole run is attained at/after the onset and is STRICTLY greater than any
pre-onset sample. Hence argmax over [onset, run_end] (what the reference
computes) equals argmax over the entire run, first-occurrence ties included —
the scan only needs run-wide aggregates. The per-element scan state is 4
carries: (segment flag, onset index or INT_MAX, running max, running argmax).

This formulation is embarrassingly parallel over runs and vectorizes as
segmented scans — no sequential dependence — so batched pick extraction runs
entirely on device and returns fixed-shape (B, MAX_PICKS) buffers + validity
masks. A numpy oracle with identical semantics is provided for testing and for
host-side extraction on very long streams.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_I32_MAX = np.iinfo(np.int32).max


def trigger_onset_numpy(prob: np.ndarray, thres1: float, thres2: float) -> List[Tuple[int, int]]:
    """Host oracle: list of (on, off) triggers, obspy trigger_onset semantics."""
    prob = np.asarray(prob)
    above2 = prob > thres2
    if not above2.any():
        return []
    # run boundaries of above2
    d = np.diff(above2.astype(np.int8))
    run_starts = list(np.where(d == 1)[0] + 1)
    run_ends = list(np.where(d == -1)[0])  # inclusive last index of run
    if above2[0]:
        run_starts.insert(0, 0)
    if above2[-1]:
        run_ends.append(len(prob) - 1)
    triggers = []
    above1 = prob > thres1
    for s, e in zip(run_starts, run_ends):
        idx = np.where(above1[int(s) : int(e) + 1])[0]
        if len(idx):
            triggers.append((int(s) + int(idx[0]), int(e)))
    return triggers


def picks_from_prob_numpy(
    prob: np.ndarray, thres: float, thres2: float | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Pick samples + peak values from a probability curve (host oracle).

    Matches reference `eval_taks0.get_picks_from_prob` (`eval_taks0.py:46-56`):
    trigger_onset(prob, thres, thres/2); pick = on + argmax(prob[on:off]).
    """
    if thres2 is None:
        thres2 = thres / 2.0
    triggers = trigger_onset_numpy(prob, thres, thres2)
    picks, values = [], []
    for on, off in triggers:
        # the reference searches prob[s0 : s1 + 1] — inclusive of the
        # (obspy-inclusive) off index (`eval_taks0.py:46-56`)
        seg = prob[on : off + 1]
        k = int(np.argmax(seg))
        picks.append(on + k)
        values.append(float(prob[on + k]))
    return np.asarray(picks, dtype=np.int64), np.asarray(values, dtype=np.float64)


# --------------------------------------------------------------------- monoid
# Element state: (flag, onset, m, am)
#   flag : bool — this position starts a new >thres2 run (segment reset)
#   onset: int32 — first index with prob > thres1 seen so far in the current
#          segment, or INT32_MAX if none ("seen" == onset < INT32_MAX)
#   m    : float — running max of prob over the segment (-inf outside runs)
#   am   : int32 — index of the running max (first occurrence)
# Identity element: (False, INT32_MAX, -inf, 0). combine(identity, x) == x for
# every field that is ever read downstream (onset/m/am are only consumed at
# emit positions, which lie inside runs where m > -inf and flags have reset
# the state since the identity).


def _combine(a, c):
    af, a_on, a_m, a_am = a
    cf, c_on, c_m, c_am = c
    use_c = c_m > a_m  # strict: first occurrence of the max wins
    m = jnp.where(use_c, c_m, a_m)
    am = jnp.where(use_c, c_am, a_am)
    on = jnp.minimum(a_on, c_on)  # left half holds earlier indices
    # right half opens a new segment: discard the left state entirely
    return (
        af | cf,
        jnp.where(cf, c_on, on),
        jnp.where(cf, c_m, m),
        jnp.where(cf, c_am, am),
    )


def _elem_state(prob, above1, above2, run_start, pos):
    neg_inf = jnp.array(-jnp.inf, dtype=prob.dtype)
    val = jnp.where(above2, prob, neg_inf)
    onset0 = jnp.where(above1 & above2, pos, _I32_MAX)
    return (run_start, onset0, val, pos)


def _identity_like(state, shape):
    flag, onset, m, am = state
    return (
        jnp.zeros(shape, dtype=flag.dtype),
        jnp.full(shape, _I32_MAX, dtype=onset.dtype),
        jnp.full(shape, -jnp.inf, dtype=m.dtype),
        jnp.zeros(shape, dtype=am.dtype),
    )


def _shift_right(state, d, axis=-1):
    """Shift each state array right by d along `axis`, filling with identity."""
    out = []
    fills = (False, _I32_MAX, -jnp.inf, 0)
    for arr, fill in zip(state, fills):
        pad = [(0, 0)] * arr.ndim
        ax = axis % arr.ndim
        pad[ax] = (d, 0)
        shifted = jnp.pad(arr, pad, constant_values=fill)
        out.append(jax.lax.slice_in_dim(shifted, 0, arr.shape[ax], axis=ax))
    return tuple(out)


def _scan_assoc(state):
    return jax.lax.associative_scan(_combine, state, axis=-1)


def _scan_shift(state):
    """Hillis–Steele inclusive scan: log2(W) shift+combine passes.

    Avoids associative_scan's odd/even lane interleaving, which lowers to
    expensive cross-lane shuffles on TPU; contiguous pad+slice shifts run at
    HBM/VMEM bandwidth instead.
    """
    w = state[0].shape[-1]
    d = 1
    while d < w:
        state = _combine(_shift_right(state, d), state)
        d *= 2
    return state


def _scan_blocked(state, block: int = 2048):
    """Two-level scan: intra-block Hillis–Steele + tiny cross-block scan.

    (B, W) reshapes to (B, Nb, L): log2(L) full-size passes instead of
    log2(W), one (B, Nb) block-summary scan, and one combine pass applying
    the exclusive block prefix. Exact same result as the flat scan.
    """
    lead = state[0].shape[:-1]
    w = state[0].shape[-1]
    nb = -(-w // block)
    padded = nb * block
    if padded != w:
        idn = _identity_like(state, lead + (padded - w,))
        state = tuple(
            jnp.concatenate([a, i], axis=-1) for a, i in zip(state, idn)
        )
    blocked = tuple(a.reshape(lead + (nb, block)) for a in state)
    intra = _scan_shift(blocked)
    # summaries: last element of each block, scanned exclusively over blocks
    summ = tuple(a[..., -1] for a in intra)  # (..., Nb)
    summ_inc = _scan_shift(summ) if nb > 1 else summ
    prefix = _shift_right(summ_inc, 1, axis=-1)  # exclusive
    prefix = tuple(a[..., None] for a in prefix)  # broadcast over L
    out = _combine(prefix, intra)
    out = tuple(a.reshape(lead + (padded,))[..., :w] for a in out)
    return out


def extract_picks_batched(
    prob: jnp.ndarray,
    thres1: float,
    thres2: float | None = None,
    max_picks: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """On-device batched pick extraction (peaks only).

    prob: (B, W) probability curves. Returns (pick_idx, pick_value, valid) each
    (B, max_picks); entries beyond the number of real picks are masked out and
    have pick_idx = -1. Picks are ordered by time. Semantics identical to
    ``picks_from_prob_numpy``; if a trace has more than max_picks triggers, the
    earliest max_picks are kept.
    """
    idx, val, valid, _, _ = extract_triggers_batched(prob, thres1, thres2, max_picks)
    return idx, val, valid


def _scan_states(prob, thres1, thres2, method: str):
    b, w = prob.shape
    t1 = jnp.asarray(thres1, dtype=prob.dtype).reshape(-1, 1)  # (1|B, 1)
    t2 = jnp.asarray(thres2, dtype=prob.dtype).reshape(-1, 1)
    above2 = prob > t2
    above1 = prob > t1

    prev2 = jnp.pad(above2[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    run_start = above2 & ~prev2  # first sample of each >thres2 run
    next2 = jnp.pad(above2[:, 1:], ((0, 0), (0, 1)), constant_values=False)
    run_end = above2 & ~next2  # last sample of each run

    pos = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (b, w))
    if method == "pallas":
        from volpick_tpu.ops.pallas.triggers import trigger_scan_pallas_raw

        interpret = jax.default_backend() != "tpu"
        onset_idx, run_max, run_argmax = trigger_scan_pallas_raw(
            prob, t1, t2, interpret=interpret
        )
        return run_end, onset_idx, run_max, run_argmax, pos
    state = _elem_state(prob, above1, above2, run_start, pos)
    if method == "assoc":
        scanned = _scan_assoc(state)
    elif method == "shift":
        scanned = _scan_shift(state)
    elif method == "blocked":
        scanned = _scan_blocked(state)
    else:
        raise ValueError(f"unknown trigger scan method {method!r}")
    _, onset_idx, run_max, run_argmax = scanned
    return run_end, onset_idx, run_max, run_argmax, pos


def default_trigger_method() -> str:
    """Scan strategy default: overridable via VOLPICK_TRIGGER_METHOD.

    All methods are exact (property-tested vs the numpy oracle); they differ
    only in lowering cost. On-TPU measurements (docs/TPU_PROBE.jsonl trigger
    stage, 24x120k curves): pallas 3.18 ms full extract / 0.39 ms scan,
    blocked 3.24 ms, shift 3.20 ms, assoc 12.2 ms. End-to-end fused classify
    (classify_methods stage, 1832 windows/iter, one-scan fusion):
    pallas_full 110.1 k windows/s vs pallas/blocked/shift 100.2–100.9 k vs
    assoc 66.9 k — "pallas_full" fuses pick emission into the kernel too (no
    (B, W) scanned state in HBM, no top_k compaction), so it is the TPU
    default. On CPU the kernels would run in interpret mode (orders of
    magnitude slower), so non-TPU backends default to the pure-XLA blocked
    scan.
    """
    method = os.environ.get("VOLPICK_TRIGGER_METHOD")
    if method:
        return method
    return "pallas_full" if jax.default_backend() == "tpu" else "blocked"


def _earliest_k(order: jnp.ndarray, sentinel: int, k: int, block: int = 4096):
    """k smallest entries of each (B, W) row, ascending (two-stage top_k).

    `order` holds positions at emitting entries and `sentinel` (> any
    position) elsewhere. For long rows, a flat top_k lowers to a full-row
    sort on TPU; selecting the k smallest per `block`-sized tile first is
    exact — each of the global k smallest is necessarily among its own
    tile's k smallest — and cuts the sort domain from W to block, then to
    the Nb*k candidates.
    """
    w = order.shape[-1]
    if w <= 2 * block or k >= block:
        return -jax.lax.top_k(-order, k)[0]
    nb = -(-w // block)
    pad = nb * block - w
    if pad:
        order = jnp.pad(order, ((0, 0), (0, pad)), constant_values=sentinel)
    blk = order.reshape(order.shape[0], nb, block)
    cand = -jax.lax.top_k(-blk, k)[0]  # (B, Nb, k) earliest per tile
    cand = cand.reshape(order.shape[0], nb * k)
    return -jax.lax.top_k(-cand, k)[0]


def extract_triggers_batched(
    prob: jnp.ndarray,
    thres1,
    thres2=None,
    max_picks: int = 32,
    method: str | None = None,
):
    """Full on-device trigger extraction: returns
    (peak_idx, peak_value, valid, onset_idx, offset_idx), each (B, max_picks).
    onset/offset are the trigger's [on, off] bounds (off = last index of the
    >thres2 run, inclusive -- obspy convention).

    thres1/thres2 may be scalars or per-row (B,) arrays, so heterogeneous
    channels (P/S/detection with different thresholds) batch into ONE call.

    The segmented scan computes, per element, the current run's onset (first
    >thres1 index, INT32_MAX if none yet) and run-wide max/argmax; picks are
    read off at run ends. Because pre-onset samples are <= thres1 < the onset
    sample, the run-wide argmax equals the reference's post-onset argmax over
    prob[s0 : s1 + 1] (`eval_taks0.py:46-56`), ties included. `method`
    selects the scan lowering (assoc | shift | blocked | pallas; see
    docs/TPU_PROBE.jsonl trigger stage for measurements).
    """
    if thres2 is None:
        thres2 = jnp.asarray(thres1) / 2.0
    if method is None:
        method = default_trigger_method()
    if method == "pallas_full":
        # scan + emission fused in one kernel: no (B, W) scanned state in
        # HBM and no top_k compaction at all (ops/pallas/triggers.py)
        from volpick_tpu.ops.pallas.triggers import trigger_extract_pallas

        t1 = jnp.asarray(thres1, dtype=prob.dtype)
        t2 = jnp.asarray(thres2, dtype=prob.dtype)
        return trigger_extract_pallas(
            prob, t1, t2, max_picks=max_picks,
            interpret=jax.default_backend() != "tpu",
        )
    b, w = prob.shape
    run_end, onset_idx, run_max, run_argmax, pos = _scan_states(
        prob, thres1, thres2, method
    )
    seen = onset_idx < _I32_MAX
    emit = run_end & seen
    neg_inf = jnp.array(-jnp.inf, dtype=prob.dtype)

    # Compact: take the first max_picks emitted picks per row. top_k of the
    # negated positions (descending) == the k smallest == earliest emissions;
    # a full sort of the (B, W) position array dominated the trigger stage's
    # wall time on TPU (docs/TPU_PROBE.jsonl breakdown stage).
    order = jnp.where(emit, pos, w)  # non-emitting positions rank last
    top = _earliest_k(order, w, max_picks)
    valid = top < w
    top_safe = jnp.where(valid, top, 0)
    take = lambda a: jnp.take_along_axis(a, top_safe, axis=-1)
    pick_idx = jnp.where(valid, take(run_argmax), -1)
    pick_val = jnp.where(valid, take(jnp.where(run_max == neg_inf, 0.0, run_max)), 0.0)
    on_idx = jnp.where(valid, take(onset_idx), -1)
    off_idx = jnp.where(valid, top, -1)  # emission position == run end
    return (
        pick_idx.astype(jnp.int32),
        pick_val.astype(prob.dtype),
        valid,
        on_idx.astype(jnp.int32),
        off_idx.astype(jnp.int32),
    )
