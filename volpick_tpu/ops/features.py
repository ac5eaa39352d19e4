"""Waveform feature kernels: frequency index (FI) and SNR.

Device-side, batched counterparts of the reference's per-trace feature
functions used during dataset compilation:

- frequency index: FI = log10(mean|A| in 10-15 Hz / mean|A| in 1-5 Hz) over a
  Hann-windowed rFFT (reference `volpick/data/utils.py:27-42`); used to
  separate LP from VT events.
- SNR: per-component 95th-percentile amplitude ratio in dB between a signal
  window after the S (or P) arrival and a noise window before the P arrival
  (reference `volpick/data/utils.py:45-102`).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def frequency_index(
    data: jnp.ndarray,
    dt: float,
    low_freq_band: Tuple[float, float] = (1.0, 5.0),
    high_freq_band: Tuple[float, float] = (10.0, 15.0),
) -> jnp.ndarray:
    """FI over the last axis; data (..., W) → (...)."""
    w = data.shape[-1]
    hann = 0.5 * (1 - jnp.cos(2 * jnp.pi * jnp.arange(w) / (w - 1)))
    spec = jnp.abs(jnp.fft.rfft(data * hann, axis=-1))[..., : w // 2]
    freq = jnp.fft.rfftfreq(w, dt)[: w // 2]
    hi = (freq > high_freq_band[0]) & (freq < high_freq_band[1])
    lo = (freq > low_freq_band[0]) & (freq < low_freq_band[1])
    a_hi = jnp.sum(spec * hi, axis=-1) / jnp.maximum(jnp.sum(hi), 1)
    a_lo = jnp.sum(spec * lo, axis=-1) / jnp.maximum(jnp.sum(lo), 1)
    return jnp.log10(a_hi / a_lo)


def _percentile95_abs(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """95th percentile of |x| over valid samples along the last axis.

    Masked percentile via sort: invalid samples are pushed to +inf and the
    quantile index is computed from the valid count (linear interpolation,
    numpy 'linear' method) — static shapes throughout.
    """
    ax = jnp.abs(x)
    big = jnp.full_like(ax, jnp.inf)
    vals = jnp.sort(jnp.where(valid, ax, big), axis=-1)
    n = jnp.sum(valid, axis=-1)  # (...,)
    q = 0.95 * (n.astype(jnp.float32) - 1.0)
    lo_idx = jnp.clip(jnp.floor(q).astype(jnp.int32), 0, x.shape[-1] - 1)
    hi_idx = jnp.clip(lo_idx + 1, 0, x.shape[-1] - 1)
    frac = q - lo_idx.astype(jnp.float32)
    lo = jnp.take_along_axis(vals, lo_idx[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(vals, hi_idx[..., None], axis=-1)[..., 0]
    hi = jnp.where(hi_idx.astype(jnp.float32) > (n - 1).astype(jnp.float32), lo, hi)
    return lo + frac * (hi - lo)


def snr_db(
    data: jnp.ndarray,
    p_sample: jnp.ndarray,
    s_sample: jnp.ndarray,
    winlen: int = 500,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched SNR in dB. data (B, C, W); p/s_sample (B,) float (NaN = absent).

    Semantics follow the reference (`volpick/data/utils.py:45-102`):
    noise = P95(|x|) in [p - winlen, p); signal = P95(|x|) in [s, s + winlen)
    when an S pick exists with s < W - 10, else [p, p + winlen). Traces with
    no P or p < 10 → NaN. Returns (per-channel SNRs (B, C), mean SNR (B,)).
    """
    b, c, w = data.shape
    t = jnp.arange(w)[None, None, :]
    p = p_sample[:, None, None]
    s = s_sample[:, None, None]
    has_p = ~jnp.isnan(p_sample) & (p_sample >= 10)
    has_s = ~jnp.isnan(s_sample) & (s_sample < w - 10)

    noise_valid = (t >= jnp.maximum(p - winlen, 0)) & (t < p)
    sig_start = jnp.where(has_s[:, None, None], s, p)
    sig_valid = (t >= sig_start) & (t < jnp.minimum(sig_start + winlen, w))

    noi = _percentile95_abs(data, noise_valid)
    sig = _percentile95_abs(data, sig_valid)
    good = (noi > 1e-30) & (sig > 1e-30) & has_p[:, None]
    snr = jnp.where(good, 20.0 * jnp.log10(sig / jnp.maximum(noi, 1e-30)), jnp.nan)
    mean_snr = jnp.nanmean(snr, axis=-1)
    return snr, mean_snr
