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
    thres1,
    thres2=None,
    max_picks: int = 32,
):
    """Full on-device trigger extraction: returns
    (peak_idx, peak_value, valid, onset_idx, offset_idx), each (B, max_picks).
    onset/offset are the trigger's [on, off] bounds (off = last index of the
    >thres2 run, inclusive -- obspy convention).

    thres1/thres2 may be scalars or per-row (B,) arrays, so heterogeneous
    channels (P/S/detection with different thresholds) batch into ONE call.

    The whole per-run reduction -- "has the run seen a >thres1 sample", the
    first such index (onset), and the max value/argmax over [onset, run_end]
    (the reference slices prob[s0 : s1 + 1], `eval_taks0.py:46-56`) -- runs
    as a SINGLE segmented associative scan. The post-onset max stays
    associative by carrying both the segment-wide max (m_all) and the
    post-onset max (m_post): combining L then R, the searchable region of
    the pair is L's post-onset part plus ALL of R whenever L already holds
    the onset, hence m_post = max(L.m_post, R.m_all). One scan replaces the
    previous chain of four (seen1 -> onset -> searchable -> max/argmax ->
    onset propagation), which dominated the fused classify profile
    (docs/TPU_PROBE.jsonl breakdown stage).
    """
    if thres2 is None:
        thres2 = jnp.asarray(thres1) / 2.0
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
    neg_inf = jnp.array(-jnp.inf, dtype=prob.dtype)

    # per-element state: (segment flag, seen >t1, onset idx, m_all, am_all,
    # m_post, am_post); values outside runs are -inf so they never win
    in_run = above2
    val = jnp.where(in_run, prob, neg_inf)
    seen0 = above1 & in_run
    onset0 = jnp.where(seen0, pos, 0)
    m_post0 = jnp.where(seen0, val, neg_inf)  # the onset sample is searchable
    am_post0 = pos

    def combine(a, c):
        (af, a_seen, a_on, a_mall, a_amall, a_mpost, a_ampost) = a
        (cf, c_seen, c_on, c_mall, c_amall, c_mpost, c_ampost) = c
        # segment-wide max with first-occurrence tie-break (strict >)
        use_c = c_mall > a_mall
        mall = jnp.where(use_c, c_mall, a_mall)
        amall = jnp.where(use_c, c_amall, a_amall)
        # onset: first seen wins
        on = jnp.where(a_seen, a_on, c_on)
        # post-onset max: when the left half holds the onset, the searchable
        # region continues through ALL of the right half
        r_val = jnp.where(a_seen, c_mall, c_mpost)
        r_idx = jnp.where(a_seen, c_amall, c_ampost)
        use_r = r_val > a_mpost
        mpost = jnp.where(use_r, r_val, a_mpost)
        ampost = jnp.where(use_r, r_idx, a_ampost)
        seen = a_seen | c_seen
        # right opens a new segment: discard the left state entirely
        return (
            af | cf,
            jnp.where(cf, c_seen, seen),
            jnp.where(cf, c_on, on),
            jnp.where(cf, c_mall, mall),
            jnp.where(cf, c_amall, amall),
            jnp.where(cf, c_mpost, mpost),
            jnp.where(cf, c_ampost, ampost),
        )

    (_, seen, onset_idx, _, _, run_max, run_argmax) = jax.lax.associative_scan(
        combine,
        (run_start, seen0, onset0, val, pos, m_post0, am_post0),
        axis=-1,
    )
    emit = run_end & seen

    # Compact: take the first max_picks emitted picks per row. top_k of the
    # negated positions (descending) == the k smallest == earliest emissions;
    # a full sort of the (B, W) position array dominated the trigger stage's
    # wall time on TPU (docs/TPU_PROBE.jsonl breakdown stage).
    order = jnp.where(emit, pos, w)  # non-emitting positions rank last
    top = -jax.lax.top_k(-order, max_picks)[0]
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
