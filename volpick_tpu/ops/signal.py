"""Batched, fixed-shape signal-conditioning kernels (JAX, jit/vmap/pjit friendly).

These replace the per-sample NumPy transforms the reference runs inside torch
DataLoader workers (SeisBench ``Normalize``; reference `volpick/model/models.py:259-264`
uses demean/detrend + amp_norm_type "peak") and the obspy Stream preprocessing inside
``annotate()`` (reference `README.md:54-62`). Everything is batch-first, static-shape,
and runs on device so XLA can fuse it into the model forward pass.

Conventions: waveforms are float arrays shaped (..., C, W) — channel-second-to-last,
time last (matches the reference's NCW dimension order, `volpick/data/utils.py:1189-1196`).
An optional boolean mask (..., W) marks valid samples for padded/ragged batches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

EPS = 1e-10


def demean(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None, axis: int = -1) -> jnp.ndarray:
    """Remove per-channel mean along `axis`. With `mask`, only valid samples count."""
    if mask is None:
        return x - jnp.mean(x, axis=axis, keepdims=True)
    m = mask.astype(x.dtype)
    if m.ndim == x.ndim - 1:
        m = jnp.expand_dims(m, -2)  # broadcast over channels
    denom = jnp.maximum(jnp.sum(m, axis=axis, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=axis, keepdims=True) / denom
    return (x - mean) * m


def detrend_linear(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Remove a least-squares straight line along `axis` (closed form, no solve).

    For equally spaced t = 0..W-1, the LS slope is cov(t, x)/var(t); with centered
    coordinates this is a single weighted reduction — ideal for the VPU.
    """
    w = x.shape[axis]
    t = jnp.arange(w, dtype=x.dtype)
    t = t - (w - 1) / 2.0
    shape = [1] * x.ndim
    shape[axis] = w
    t = t.reshape(shape)
    var_t = jnp.sum(t * t)
    mean = jnp.mean(x, axis=axis, keepdims=True)
    slope = jnp.sum((x - mean) * t, axis=axis, keepdims=True) / var_t
    return x - mean - slope * t


def normalize_amplitude(
    x: jnp.ndarray,
    norm: str = "peak",
    axis: int = -1,
    per_channel: bool = False,
    eps: float = EPS,
) -> jnp.ndarray:
    """Amplitude normalization matching SeisBench semantics used by the reference.

    norm="peak": divide by max |x| (over all channels jointly unless per_channel);
    norm="std":  divide by the standard deviation. The volpick models ship with
    norm="peak" (reference `Final_models/volpick/*/volpick.json.v1` model_args).
    SeisBench's Normalize with amp_norm axis=None reduces over (C, W) jointly.
    """
    reduce_axes = (axis,) if per_channel else tuple(range(x.ndim - 2, x.ndim))
    if norm == "peak":
        scale = jnp.max(jnp.abs(x), axis=reduce_axes, keepdims=True)
    elif norm == "std":
        scale = jnp.std(x, axis=reduce_axes, keepdims=True)
    else:
        raise ValueError(f"unknown norm {norm!r}")
    return x / (scale + eps)


def normalize(
    x: jnp.ndarray,
    norm: str = "peak",
    do_demean: bool = True,
    do_detrend: bool = False,
    eps: float = EPS,
) -> jnp.ndarray:
    """The full per-window conditioning block: demean [+detrend] + amplitude norm.

    Equivalent to the reference's eval augmentation
    (`volpick/model/models.py:445-452`): Normalize(demean_axis=-1,
    amp_norm_axis=None in SeisBench terms, amp_norm_type=model.norm).
    """
    if do_detrend:
        x = detrend_linear(x)
    elif do_demean:
        x = demean(x)
    return normalize_amplitude(x, norm=norm, eps=eps)


def condition_windows_from_span(
    sp: jnp.ndarray,
    n_win: int,
    stride: int,
    window: int,
    detrend: bool = False,
    norm: str = "peak",
    per_channel: bool = True,
    eps: float = EPS,
) -> jnp.ndarray:
    """Per-window conditioning computed from the UN-expanded span.

    Equivalent to
    ``normalize_amplitude(detrend[or demean](frame_windows_uniform(sp, ...)))``
    but the per-window mean and LS slope come from the UN-expanded span: via
    per-stride-block partial sums when stride divides the window (the EQT
    6000/500 fused-classify case), else via one strided convolution (kernels
    ones/W and t/var_t; with centered t, sum(t)=0 makes the slope independent
    of the mean). Either way the conditioning statistics never re-read the
    ~ceil(window/stride)x-expanded frames. Inside the fused
    classify scan this removes the expanded-tensor reduction passes that the
    per-window path pays (the reference conditions each window independently
    inside DataLoader workers, `volpick/model/models.py:259-264` /
    SeisBench Normalize; behavior here is identical up to conv accumulation
    order, ~1e-6).

    sp: (..., C, span) → (n_win, ..., C, window) conditioned frames.
    """
    from volpick_tpu.ops.windows import frame_windows_uniform

    t = jnp.arange(window, dtype=sp.dtype) - (window - 1) / 2.0
    var_t = jnp.sum(t * t)
    if window % stride == 0:
        # Fast path (EQT: 6000/500): window i covers stride-blocks [i, i+m)
        # exactly, so both stats reduce over per-block partial sums of the
        # span — O(span) VPU work with no wide-kernel conv. Numerics: the
        # slope numerator's partial sums reach ~stride*window*|x| before the
        # centered coordinates cancel, but slope divides by var_t ~ W^3/12,
        # shrinking the accumulation error below 1e-8 of the signal.
        m = window // stride
        lead = sp.shape[:-1]
        T = sp.shape[-1]
        nb = -(-T // stride)
        need = max(nb, n_win - 1 + m) * stride
        spp = jnp.pad(sp, [(0, 0)] * (sp.ndim - 1) + [(0, need - T)]) if need > T else sp
        xb = spp.reshape(lead + (-1, stride))  # (..., C, nb, stride)
        bs = jnp.sum(xb, axis=-1)  # block sums
        sums = sum(
            jax.lax.slice_in_dim(bs, k, k + n_win, axis=-1) for k in range(m)
        )  # (..., C, n_win)
        stats_list = [sums / window]
        if detrend:
            l = jnp.arange(stride, dtype=sp.dtype)
            bt = jnp.sum(xb * l, axis=-1)  # block first moments (local l)
            c = (window - 1) / 2.0
            num = sum(
                jax.lax.slice_in_dim(bt, k, k + n_win, axis=-1)
                + (k * stride - c) * jax.lax.slice_in_dim(bs, k, k + n_win, axis=-1)
                for k in range(m)
            )
            stats_list.append(num / var_t)
        stats = jnp.stack(stats_list, axis=-2)  # (..., C, O, n_win)
    else:
        # General path: one conv, two stat kernels (out0 = window mean,
        # out1 = LS slope; centered t makes the slope mean-independent)
        k_mean = jnp.full((window,), 1.0 / window, dtype=sp.dtype)
        kernels = [k_mean]
        if detrend:
            kernels.append(t / var_t)
        rhs = jnp.stack(kernels, axis=0)[:, None, :]  # (O, I=1, window)
        lead = sp.shape[:-1]
        flat = sp.reshape((-1, 1, sp.shape[-1]))  # (B, 1, span)
        stats = jax.lax.conv_general_dilated(
            flat, rhs, window_strides=(stride,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST,  # stats subtract from the
            # data; default (possibly bf16) conv precision would inject ~1e-3
        )[..., :n_win]  # (B, O, n_win)
        stats = stats.reshape(lead + stats.shape[1:])  # (..., C, O, n_win)
    mean = jnp.moveaxis(stats[..., 0, :], -1, 0)[..., None]  # (N, ..., C, 1)
    fr = frame_windows_uniform(sp, n_win, stride, window)  # (N, ..., C, window)
    det = fr - mean
    if detrend:
        slope = jnp.moveaxis(stats[..., 1, :], -1, 0)[..., None]
        det = det - slope * t
    reduce_axes = (-1,) if per_channel else (-2, -1)
    if norm == "peak":
        scale = jnp.max(jnp.abs(det), axis=reduce_axes, keepdims=True)
    elif norm == "std":
        scale = jnp.std(det, axis=reduce_axes, keepdims=True)
    else:
        raise ValueError(f"unknown norm {norm!r}")
    return det / (scale + eps)


def taper_cosine(x: jnp.ndarray, fraction: float = 0.05, axis: int = -1) -> jnp.ndarray:
    """Symmetric cosine (Tukey) taper, used before filtering long segments."""
    w = x.shape[axis]
    n = max(int(w * fraction), 1)
    ramp = 0.5 * (1 - jnp.cos(jnp.pi * jnp.arange(n, dtype=x.dtype) / n))
    window = jnp.concatenate([ramp, jnp.ones(w - 2 * n, dtype=x.dtype), ramp[::-1]])
    shape = [1] * x.ndim
    shape[axis] = w
    return x * window.reshape(shape)


def sosfilt_coeffs_bandpass(freqmin: float, freqmax: float, fs: float, order: int = 4):
    """Butterworth bandpass second-order sections (host-side; scipy design)."""
    from scipy.signal import butter

    return butter(order, [freqmin, freqmax], btype="bandpass", fs=fs, output="sos")


def sosfilt_coeffs_highpass(freq: float, fs: float, order: int = 4):
    from scipy.signal import butter

    return butter(order, freq, btype="highpass", fs=fs, output="sos")


def sosfilt(x: jnp.ndarray, sos) -> jnp.ndarray:
    """IIR cascade of biquads along the last axis via lax.scan.

    The scan carries the 2 delay states per section; all batch/channel lanes
    advance in lockstep on the VPU, so throughput is (batch × channels) parallel.
    Used for the QC band filters the reference applies on CPU
    (reference `volpick/data/utils.py:694-713`: 0.3 Hz highpass / 1-20 Hz bandpass).
    """
    sos = jnp.asarray(sos, dtype=x.dtype)  # (n_sections, 6): b0 b1 b2 a0 a1 a2
    n_sections = sos.shape[0]
    batch_shape = x.shape[:-1]
    w = x.shape[-1]
    flat = x.reshape((-1, w))

    def apply_section(sig, section):
        b0, b1, b2, _, a1, a2 = [section[i] for i in range(6)]

        def step(carry, xt):
            z1, z2 = carry
            yt = b0 * xt + z1
            z1n = b1 * xt - a1 * yt + z2
            z2n = b2 * xt - a2 * yt
            return (z1n, z2n), yt

        zeros = jnp.zeros(sig.shape[0], dtype=sig.dtype)
        _, out = jax.lax.scan(step, (zeros, zeros), sig.T)
        return out.T, None

    y, _ = jax.lax.scan(lambda s, sec: apply_section(s, sec), flat, sos)
    return y.reshape(batch_shape + (w,))


def resample_poly_device(x: jnp.ndarray, up: int, down: int, window_size: int = 64) -> jnp.ndarray:
    """Polyphase rational resampling on device (Kaiser-windowed sinc FIR).

    TPU-native counterpart of scipy.signal.resample_poly used in the ingest path
    (reference `volpick/data/convert.py:122-140` resamples all traces to 100 Hz).
    Implemented as zero-stuff → FIR (depthwise conv) → decimate; the conv maps to
    XLA's convolution on the MXU for large batches.
    """
    from scipy.signal import firwin
    import numpy as np

    g = np.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return x
    max_rate = max(up, down)
    half_len = (window_size // 2) * max_rate
    cutoff = 1.0 / max_rate
    h = firwin(2 * half_len + 1, cutoff, window=("kaiser", 5.0)) * up
    h = jnp.asarray(h, dtype=x.dtype)

    batch_shape = x.shape[:-1]
    w = x.shape[-1]
    flat = x.reshape((-1, 1, w))
    lhs = flat
    rhs = h.reshape((1, 1, -1))
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(down,),
        padding=[(half_len, half_len)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    new_w = (w * up) // down + (1 if (w * up) % down else 0)
    out = out[..., :new_w]
    return out.reshape(batch_shape + (out.shape[-1],))
