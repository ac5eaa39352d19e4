"""Sliding-window framing + overlap-average stacking with blinding (on device).

This is the long-context story of the reference: continuous streams of arbitrary
length are processed as fixed windows (3001 for PhaseNet / 6000 for EQTransformer)
with overlap, edge *blinding*, and "avg" stacking back into continuous probability
curves (reference `README.md:54-62`: overlap 5500, blinding (500,500), stacking
"avg"). The reference delegates this to SeisBench's annotate(); here it is a pair
of fixed-shape device kernels:

- ``frame_windows``: (C, W_total) + starts → (N, C, window)  [gather]
- ``overlap_stack``: (N, K, window) predictions + starts → (K, W_total) [scatter-add]

Both are jit-compatible with static window counts, so a day-long stream compiles
once per (n_windows, window) bucket.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_starts(n_samples: int, window: int, overlap: int) -> np.ndarray:
    """Host helper: window start offsets for a stream of n_samples.

    Stride = window - overlap; windows at 0, stride, 2*stride, ...; if the final
    window does not end exactly at the last sample, one extra window flush with
    the end is added (SeisBench annotate behavior, so every sample is covered).
    Streams shorter than one window yield a single start at 0 (caller pads).
    """
    if overlap >= window:
        raise ValueError(f"overlap {overlap} must be < window {window}")
    stride = window - overlap
    if n_samples <= window:
        return np.array([0], dtype=np.int64)
    starts = np.arange(0, n_samples - window + 1, stride, dtype=np.int64)
    if starts[-1] + window < n_samples:
        starts = np.append(starts, n_samples - window)
    return starts


def frame_windows(x: jnp.ndarray, starts: jnp.ndarray, window: int) -> jnp.ndarray:
    """Gather fixed windows from a continuous array.

    x: (..., C, W_total); starts: (N,) int; returns (N, ..., C, window).
    Implemented with a vmapped dynamic_slice — XLA lowers this to an efficient
    gather over the last axis.
    """

    def one(s):
        return jax.lax.dynamic_slice_in_dim(x, s, window, axis=-1)

    return jax.vmap(one)(starts)


def frame_windows_uniform(
    x: jnp.ndarray, n_win: int, stride: int, window: int
) -> jnp.ndarray:
    """Gather-free framing for uniformly strided windows (starts = i·stride).

    x: (..., C, T) → (N, ..., C, window). With m = ceil(window/stride), the
    input reshapes into stride-blocks and window i is the concatenation of
    blocks [i, i+m) — m contiguous strided copies instead of a gather, which
    runs at HBM bandwidth where XLA's gather of overlapping slices does not
    (docs/TPU_PROBE.jsonl breakdown stage). Exact same output as
    ``frame_windows(x, arange(n_win)*stride, window)``.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    m = -(-window // stride)
    lead = x.shape[:-1]
    t = x.shape[-1]
    nb = max(-(-t // stride), n_win - 1 + m)
    pad = nb * stride - t
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xb = x.reshape(lead + (nb, stride))
    parts = [
        jax.lax.slice_in_dim(xb, i, i + n_win, axis=x.ndim - 1) for i in range(m)
    ]
    fr = jnp.stack(parts, axis=-2)  # (..., n_win, m, stride)
    fr = fr.reshape(lead + (n_win, m * stride))[..., :window]
    # (..., N, window) → (N, ..., window)
    return jnp.moveaxis(fr, -2, 0)


def overlap_stack(
    preds: jnp.ndarray,
    starts: jnp.ndarray,
    total_len: int,
    blinding: Tuple[int, int] = (0, 0),
    stacking: str = "avg",
) -> jnp.ndarray:
    """Reassemble overlapping window predictions into a continuous curve.

    preds: (N, K, window) per-window class probabilities; starts: (N,) window
    offsets into the output of length total_len. ``blinding=(l, r)`` discards
    the first l / last r samples of every window before stacking (edge effects),
    matching SeisBench's blinding semantics. stacking "avg" averages all
    non-blinded contributions per sample; "max" takes their maximum. Samples
    covered only by blinded regions come out as 0.

    TPU notes: expressed as a scatter-add over a precomputed (N, window) index
    map; XLA emits a single fused scatter. No data-dependent shapes.
    """
    n, k, window = preds.shape
    l, r = blinding
    idx = starts[:, None] + jnp.arange(window)[None, :]  # (N, window)
    valid = jnp.zeros((n, window), dtype=bool)
    valid = valid.at[:, l : window - r if r else window].set(True)

    flat_idx = idx.reshape(-1)
    mask = valid.reshape(-1)

    if stacking == "avg":
        out = jnp.zeros((k, total_len), dtype=preds.dtype)
        weight = jnp.zeros((total_len,), dtype=preds.dtype)
        contrib = preds * valid[:, None, :].astype(preds.dtype)
        # (N, K, window) → (K, N*window) scatter-add along time
        contrib_flat = contrib.transpose(1, 0, 2).reshape(k, -1)
        out = out.at[:, flat_idx].add(contrib_flat, mode="drop")
        weight = weight.at[flat_idx].add(mask.astype(preds.dtype), mode="drop")
        return out / jnp.maximum(weight, 1.0)[None, :]
    elif stacking == "max":
        neg = jnp.full((k, total_len), 0.0, dtype=preds.dtype)
        contrib = jnp.where(valid[:, None, :], preds, 0.0)
        contrib_flat = contrib.transpose(1, 0, 2).reshape(k, -1)
        return neg.at[:, flat_idx].max(contrib_flat, mode="drop")
    else:
        raise ValueError(f"unknown stacking {stacking!r}")


def overlap_stack_uniform(
    preds: jnp.ndarray,
    stride: int,
    blinding: Tuple[int, int] = (0, 0),
    stacking: str = "avg",
    return_sums: bool = False,
):
    """Scatter-free overlap stacking for uniformly strided windows.

    With m = ceil(window/stride), window j covers output blocks [j, j+m), so
    out_block[q] = reduce_i preds[q-i, :, i·stride:(i+1)·stride] — m shifted
    adds of contiguous arrays instead of a scatter. Windows whose length is
    not a stride multiple are zero-padded with zero stacking weight, which is
    exact. Output length is (n+m-1)·stride ≥ (N-1)·stride + window; callers
    trim to their stream length. ~an order of magnitude faster than the
    scatter form on TPU for day-long streams.

    With ``return_sums=True`` the "avg" division is deferred: returns
    ``(acc (K, L), weights (L,))`` — for "avg" the blinding-masked sum and
    per-sample contribution count, for "max" the running max (weights still
    the counts). This lets callers compose extra non-uniform windows (e.g.
    the SeisBench final flush window) before normalizing.
    """
    n, k, window = preds.shape
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    # stride > window (gapped windows) works too: m=1 and the zero-weight pad
    # covers the gap, which comes out as 0 like the scatter form.
    m = max(-(-window // stride), 1)  # ceil
    l, r = blinding
    total_blocks = n + m - 1
    pad = m * stride - window
    a = jnp.pad(preds, ((0, 0), (0, 0), (0, pad))).reshape(n, k, m, stride)

    w_mask = jnp.zeros((m * stride,), dtype=preds.dtype).at[l : window - r].set(1.0)
    w_mask = w_mask.reshape(m, stride)

    wgt = jnp.zeros((total_blocks, 1, stride), dtype=preds.dtype)
    for i in range(m):
        wgt = wgt.at[i : i + n].add(w_mask[i][None, None, :])
    if stacking == "avg":
        out = jnp.zeros((total_blocks, k, stride), dtype=preds.dtype)
        for i in range(m):
            out = out.at[i : i + n].add(a[:, :, i] * w_mask[i])
        if not return_sums:
            out = out / jnp.maximum(wgt, 1.0)
    elif stacking == "max":
        out = jnp.zeros((total_blocks, k, stride), dtype=preds.dtype)
        for i in range(m):
            out = out.at[i : i + n].max(a[:, :, i] * w_mask[i])
    else:
        raise ValueError(f"unknown stacking {stacking!r}")
    out = out.transpose(1, 0, 2).reshape(k, total_blocks * stride)
    if return_sums:
        return out, wgt.reshape(total_blocks * stride)
    return out


def uniform_stack_weights(
    n_win: int,
    stride: int,
    window: int,
    blinding: Tuple[int, int],
    out_len: int,
) -> np.ndarray:
    """Static per-sample stacking weights for a uniform window grid.

    Mirrors ``overlap_stack_uniform``'s device-side weight accumulation
    exactly (same m-block shifted-add formulation, so the float sums are
    bit-identical): weight[t] = number of non-blinded window samples covering
    output sample t. Being input-independent, these weights are computed once
    at trace time on host — the fused classify/annotate path carries only the
    probability accumulator through its scan and divides by this constant.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    m = max(-(-window // stride), 1)
    l, r = blinding
    w_mask = np.zeros((m * stride,), dtype=np.float32)
    w_mask[l : window - r] = 1.0
    w_mask = w_mask.reshape(m, stride)
    total_blocks = n_win + m - 1
    w = np.zeros((total_blocks, stride), dtype=np.float32)
    for i in range(m):
        w[i : i + n_win] += w_mask[i]
    w = w.reshape(-1)
    out = np.zeros(out_len, dtype=np.float32)
    n = min(out_len, w.size)
    out[:n] = w[:n]
    return out


def steered_window_indices(
    n_samples: int,
    start_sample: np.ndarray,
    end_sample: np.ndarray,
    window: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Window placement for steered evaluation (SeisBench SteeredWindow semantics).

    Places a fixed-length window containing the region [start_sample, end_sample)
    of each trace: the region is centered when possible, shifted to stay inside
    the trace, with zero-padding when the trace is shorter than the window
    (strategy="pad", reference `volpick/model/models.py:445-452`).

    Returns (window_start, border_lo, border_hi): window_start is the offset of
    the window in the trace (may be negative → pad left), and [border_lo,
    border_hi) is the region's span inside the window (the reference's
    "window_borders", sliced in predict_step, `models.py:454-480`).
    """
    start_sample = np.asarray(start_sample, dtype=np.int64)
    end_sample = np.asarray(end_sample, dtype=np.int64)
    region = end_sample - start_sample
    slack = window - region
    w0 = start_sample - slack // 2
    if n_samples >= window:
        w0 = np.clip(w0, 0, n_samples - window)
    else:
        w0 = np.zeros_like(w0)  # pad right
    border_lo = start_sample - w0
    border_hi = border_lo + region
    return w0, border_lo, border_hi


def pad_frame(
    data: np.ndarray, w0: int, window: int
) -> np.ndarray:
    """Host-side framing with zero pad for out-of-range regions.

    data: (C, W); returns (C, window) for window starting at w0 (may extend
    beyond either end of data).
    """
    c, n = data.shape
    out = np.zeros((c, window), dtype=data.dtype)
    lo = max(w0, 0)
    hi = min(w0 + window, n)
    if hi > lo:
        out[:, lo - w0 : hi - w0] = data[:, lo:hi]
    return out
