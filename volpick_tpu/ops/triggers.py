"""Two-threshold hysteresis trigger + peak extraction, vectorized for device.

The reference extracts picks with obspy's ``trigger_onset(prob, thr, thr/2)``
followed by an argmax per trigger (reference `volpick/model/eval_taks0.py:46-56`),
a sequential Python loop per trace. The semantics reduce to a run-based rule:

  For each maximal run of samples with prob > thres2, if the run contains at
  least one sample with prob > thres1, emit one trigger
  [first index in run with prob > thres1, last index of run], and the pick is
  argmax(prob[on:off]) (off exclusive) with its probability value.

This formulation is embarrassingly parallel over runs and vectorizes as
segmented scans — no sequential dependence — so batched pick extraction runs
entirely on device and returns fixed-shape (B, MAX_PICKS) buffers + validity
masks. A numpy oracle with identical semantics is provided for testing and for
host-side extraction on very long streams.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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


def _segmented_scan_max(values: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max along the last axis that resets at `starts` flags.

    Uses an associative operator over (reset_flag, value) pairs, so it lowers
    to a log-depth parallel scan on the VPU instead of a sequential loop.
    """

    def combine(a, b):
        a_flag, a_val = a
        b_flag, b_val = b
        val = jnp.where(b_flag, b_val, jnp.maximum(a_val, b_val))
        return (a_flag | b_flag, val)

    flags, out = jax.lax.associative_scan(
        combine, (starts, values), axis=-1
    )
    return out


def _segmented_scan_or(flags_in: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    def combine(a, b):
        a_flag, a_val = a
        b_flag, b_val = b
        val = jnp.where(b_flag, b_val, a_val | b_val)
        return (a_flag | b_flag, val)

    _, out = jax.lax.associative_scan(combine, (starts, flags_in), axis=-1)
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


def extract_triggers_batched(
    prob: jnp.ndarray,
    thres1: float,
    thres2: float | None = None,
    max_picks: int = 32,
):
    """Full on-device trigger extraction: returns
    (peak_idx, peak_value, valid, onset_idx, offset_idx), each (B, max_picks).
    onset/offset are the trigger's [on, off] bounds (off = last index of the
    >thres2 run, inclusive — obspy convention)."""
    if thres2 is None:
        thres2 = thres1 / 2.0
    b, w = prob.shape
    above2 = prob > thres2
    above1 = prob > thres1

    prev2 = jnp.pad(above2[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    run_start = above2 & ~prev2  # first sample of each >thres2 run
    next2 = jnp.pad(above2[:, 1:], ((0, 0), (0, 1)), constant_values=False)
    run_end = above2 & ~next2  # last sample of each run

    # First >thres1 sample within each run: above1 and no earlier above1 in run.
    seen1 = _segmented_scan_or(above1, run_start)  # inclusive: any above1 so far in run
    prev_seen1 = jnp.pad(seen1[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    # reset prev_seen1 at run starts (the previous value belongs to the old run)
    prev_seen1 = jnp.where(run_start, False, prev_seen1)
    onset = above1 & ~prev_seen1 & above2  # one per qualifying run

    # Peak within [onset, run_end): forward segmented argmax restricted to >= onset.
    # Track running (max value, argmax index) within each run, counting only
    # samples at/after the onset, and excluding the run-end sample itself
    # (reference slices prob[on:off] with off exclusive) unless the run has
    # length 1 after the onset.
    pos = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (b, w))
    # peak search covers [onset, run_end] inclusive (the reference slices
    # prob[s0 : s1 + 1], `eval_taks0.py:46-56`)
    searchable = _segmented_scan_or(onset, run_start)  # at/after onset within run
    neg_inf = jnp.array(-jnp.inf, dtype=prob.dtype)
    vals = jnp.where(searchable, prob, neg_inf)

    def combine(a, b):
        a_flag, a_val, a_idx = a
        b_flag, b_val, b_idx = b
        # If b opens a new segment, a's state is discarded; otherwise keep the
        # running max with first-occurrence tie-breaking (strict >, like argmax).
        use_b = b_flag | (b_val > a_val)
        return (
            a_flag | b_flag,
            jnp.where(use_b, b_val, a_val),
            jnp.where(use_b, b_idx, a_idx),
        )

    _, run_max, run_argmax = jax.lax.associative_scan(
        combine, (run_start, vals, pos), axis=-1
    )
    # At each run_end with a qualifying onset, (run_max, run_argmax) hold the
    # peak. Note argmax ties resolve to the *first* max (strict > comparison),
    # matching numpy argmax.
    emit = run_end & _segmented_scan_or(onset, run_start)

    # Propagate each run's onset index to its run_end for trigger bounds.
    def combine_first(a, b):
        a_flag, a_has, a_idx = a
        b_flag, b_has, b_idx = b
        has = jnp.where(b_flag, b_has, a_has | b_has)
        idx = jnp.where(b_flag, b_idx, jnp.where(a_has, a_idx, b_idx))
        return (a_flag | b_flag, has, idx)

    _, _, onset_idx = jax.lax.associative_scan(
        combine_first, (run_start, onset, jnp.where(onset, pos, 0)), axis=-1
    )

    # Compact: take the first max_picks emitted picks per row.
    order = jnp.where(emit, pos, w)  # non-emitting positions sort last
    top = jnp.sort(order, axis=-1)[:, :max_picks]  # earliest emissions
    valid = top < w
    top_safe = jnp.where(valid, top, 0)
    take = lambda a: jnp.take_along_axis(a, top_safe, axis=-1)
    pick_idx = jnp.where(valid, take(run_argmax), -1)
    pick_val = jnp.where(valid, take(jnp.where(run_max == neg_inf, 0.0, run_max)), 0.0)
    on_idx = jnp.where(valid, take(onset_idx), -1)
    off_idx = jnp.where(valid, top, -1)  # emission position == run end (inclusive)
    return (
        pick_idx.astype(jnp.int32),
        pick_val.astype(prob.dtype),
        valid,
        on_idx.astype(jnp.int32),
        off_idx.astype(jnp.int32),
    )
