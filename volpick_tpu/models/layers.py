"""Functional neural-net layers for the picking trunks (pure JAX, NCW layout).

Design notes (TPU-first):
- Waveforms are (B, C, W): batch, channel, time. Convs use XLA's
  conv_general_dilated with ('NCH','OIH','NCH') dimension numbers; kernels are
  stored (O, I, K) — the same layout as torch Conv1d weights, so the weight
  importer is a plain copy for forward convs.
- Transposed convs are expressed as input-dilated regular convs with the
  kernel pre-flipped/transposed at import time (see torch_import.py), which
  XLA maps onto the same convolution HLO (MXU) as the forward convs.
- BatchNorm carries running statistics in the param tree; in train mode the
  batch statistics are used and updated running stats are returned through an
  `updates` side-channel dict (functional state threading).
- LSTMs run as lax.scan over time with all gates fused into one matmul per
  step; gate order is (i, f, g, o) — torch's — so imported weights are used
  as-is.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: Tuple[int, int] = (0, 0),
    lhs_dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """1D convolution, NCW x (O,I,K) → NCW.

    With groups=G (feature_group_count), input channels split into G groups
    of I each and filter rows [g·O/G, (g+1)·O/G) convolve group g — used to
    run several same-shaped branches (e.g. the EQT det/P/S decoders) as one
    wider conv instead of G sequential small ones.
    """
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[padding],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def conv1d_same(x, w, b=None, groups: int = 1):
    """'same' conv for odd or even kernels (even pads one extra on the right,
    torch/keras asymmetric-same convention used by the reference models)."""
    k = w.shape[-1]
    return conv1d(x, w, b, padding=((k - 1) // 2, k // 2), groups=groups)


def upsample2_conv1d_same(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    crop_last: bool = False,
    groups: int = 1,
) -> jnp.ndarray:
    """`conv1d_same(upsample_nearest(x, 2)[..., :-1 if crop_last else None], w, b)`
    as TWO polyphase convs at input resolution — the decoder hot path.

    Nearest-upsampling repeats every sample, so output parity r satisfies
    ``out[2i+r] = Σ_j w[j]·x[(2i+r+j-p)//2]``: taps j that floor to the same
    x index condense into one tap, giving per-parity kernels of ⌈k/2⌉+... ≤
    ⌈(k+1)/2⌉ taps. Halves the conv FLOPs and never materializes the 2×
    upsampled intermediate in HBM. Exact up to the w-tap pre-summation
    reassociation (pinned ≤1e-5 by tests). Odd k only (the EQT/PhaseNet
    decoder kernels are 3/5/7/9/11).

    ``crop_last`` reproduces the decoder's odd-length step (upsample → drop
    last sample → conv): computed as the even-length result sliced to 2T−1
    with the phantom last-copy contribution of x[T−1] subtracted from the
    final (k−1)//2 positions (exact, see _decoder_crops).
    """
    k = w.shape[-1]
    if k % 2 == 0:
        raise ValueError("upsample2_conv1d_same supports odd kernels only")
    p = (k - 1) // 2
    t = x.shape[-1]
    outs = []
    for r in (0, 1):
        d_vals = [(r + j - p) // 2 for j in range(k)]
        d_min, d_max = d_vals[0], d_vals[-1]
        wk = jnp.zeros(w.shape[:-1] + (d_max - d_min + 1,), w.dtype)
        for j, d in enumerate(d_vals):
            wk = wk.at[..., d - d_min].add(w[..., j])
        outs.append(conv1d(x, wk, padding=(-d_min, d_max), groups=groups))
    y = jnp.stack(outs, axis=-1).reshape(x.shape[0], w.shape[0], 2 * t)
    if crop_last:
        y = y[..., : 2 * t - 1]
        if p > 0:
            # u_full[2T-1] = x[T-1] leaked into the last p outputs; remove it
            in_per_group = w.shape[1]
            o_per_group = w.shape[0] // groups
            xg = x[..., t - 1].reshape(x.shape[0], groups, in_per_group)
            # position m (of the last p) uses tap j = 2p - m: w[..., p+1:] reversed
            wg = w[..., p + 1 :][..., ::-1].reshape(groups, o_per_group, in_per_group, p)
            corr = jnp.einsum("bgi,goip->bgop", xg, wg).reshape(
                x.shape[0], w.shape[0], p
            )
            y = y.at[..., 2 * t - 1 - p :].add(-corr)
    if b is not None:
        y = y + b[None, :, None]
    return y


def conv_transpose1d(
    x: jnp.ndarray,
    w_flipped: jnp.ndarray,
    stride: int,
    k: int,
    padding: int = 0,
) -> jnp.ndarray:
    """Transposed conv expressed as an input-dilated conv.

    `w_flipped` must be (O, I, K) with the spatial axis flipped relative to a
    torch ConvTranspose1d weight (I, O, K); torch_import performs that
    transform once. Output length: (L-1)*stride + K - 2*padding.
    """
    pad = k - 1 - padding
    return conv1d(x, w_flipped, stride=1, padding=(pad, pad), lhs_dilation=stride)


def batch_norm(
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    train: bool = False,
    eps: float = 1e-3,
    momentum: float = 0.1,
):
    """BatchNorm1d over (B, C, W); normalizes per channel over (B, W).

    Returns (y, state_update|None). `p` holds scale/bias/mean/var. eps
    defaults to 1e-3 (TF/Keras convention the original PhaseNet/EQTransformer
    models were built with, preserved by their torch ports).
    """
    if train:
        mean = jnp.mean(x, axis=(0, 2))
        var = jnp.var(x, axis=(0, 2))
        n = x.shape[0] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        update = {
            "mean": (1 - momentum) * p["mean"] + momentum * mean,
            "var": (1 - momentum) * p["var"] + momentum * unbiased,
        }
    else:
        mean, var = p["mean"], p["var"]
        update = None
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean[None, :, None]) * (inv * p["scale"])[None, :, None] + p["bias"][None, :, None]
    return y, update


def layer_norm_keras(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-14):
    """Keras-style LayerNormalization over the channel axis of (B, C, W).

    gamma/beta are stored (C, 1) — the shape the reference's EQTransformer
    weights use (`transformer_d0.norm1.gamma (16, 1)`).
    """
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    std = jnp.sqrt(var + eps)
    return gamma[None] * (x - mean) / std + beta[None]


def max_pool1d(x: jnp.ndarray, k: int = 2, stride: Optional[int] = None, padding: int = 0):
    """MaxPool over the last axis with -inf padding (torch semantics)."""
    stride = stride or k
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, k),
        window_strides=(1, 1, stride),
        padding=((0, 0), (0, 0), (padding, padding)),
    )


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsampling along time (torch nn.Upsample(scale_factor))."""
    return jnp.repeat(x, factor, axis=-1)


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array], train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def spatial_dropout1d(x: jnp.ndarray, rate: float, rng: Optional[jax.Array], train: bool):
    """Drops whole channels (keras SpatialDropout1D semantics)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], x.shape[1], 1))
    return jnp.where(mask, x / keep, 0.0)


def lstm(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    reverse: bool = False,
) -> jnp.ndarray:
    """Unidirectional LSTM over (B, C, T) → (B, H, T).

    torch layout: w_ih (4H, C), w_hh (4H, H), gate order (i, f, g, o).
    The input projection for all timesteps is hoisted out of the scan into a
    single large matmul (MXU-friendly); the scan carries only the (B, H)
    recurrent state. Sequence lengths here are ≤ 47 (post-pooling), so the
    sequential scan is cheap.
    """
    h_dim = w_hh.shape[1]
    b, c, t = x.shape
    # (T, B, 4H): one big input projection
    x_t = x.transpose(2, 0, 1)
    if reverse:
        x_t = x_t[::-1]
    x_proj = x_t @ w_ih.T + (b_ih + b_hh)

    def step(carry, xp):
        h, cell = carry
        gates = xp + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        cell = f * cell + i * g
        h = o * jnp.tanh(cell)
        return (h, cell), h

    init = (jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))
    _, hs = jax.lax.scan(step, init, x_proj)
    if reverse:
        hs = hs[::-1]
    return hs.transpose(1, 2, 0)  # (B, H, T)


def lstm_multi(
    xs: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    bias: jnp.ndarray,
) -> jnp.ndarray:
    """G independent LSTMs advanced by ONE scan. xs (G, B, C, T) → (G, B, H, T).

    Weights are stacked per branch: w_ih (G, 4H, C), w_hh (G, 4H, H),
    bias (G, 4H) (= b_ih + b_hh). Each branch g computes exactly
    ``lstm(xs[g], w_ih[g], ...)``; merging them keeps the 47-step sequential
    chain but runs G tiny per-step matmuls as one batched einsum — the pick
    LSTMs and the BiLSTM directions are latency-bound, so halving/quartering
    the number of scans cuts the sequential critical path directly.
    Branches that should run reversed must be time-flipped by the caller
    (flip input, flip the returned hidden states back).
    """
    g, b, c, t = xs.shape
    h_dim = w_hh.shape[-1]
    x_t = xs.transpose(3, 0, 1, 2)  # (T, G, B, C)
    x_proj = jnp.einsum("tgbc,ghc->tgbh", x_t, w_ih) + bias[:, None, :]

    def step(carry, xp):
        h, cell = carry
        gates = xp + jnp.einsum("gbh,gkh->gbk", h, w_hh)
        i, f, gg, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        gg = jnp.tanh(gg)
        cell = f * cell + i * gg
        h = o * jnp.tanh(cell)
        return (h, cell), h

    init = (
        jnp.zeros((g, b, h_dim), xs.dtype),
        jnp.zeros((g, b, h_dim), xs.dtype),
    )
    _, hs = jax.lax.scan(step, init, x_proj)  # (T, G, B, H)
    return hs.transpose(1, 2, 3, 0)  # (G, B, H, T)


def bilstm(x: jnp.ndarray, p: Dict[str, jnp.ndarray], fused=False) -> jnp.ndarray:
    """Bidirectional LSTM: concat forward and backward hidden states on channels.

    With ``fused=True`` both directions ride one lstm_multi scan (the reverse
    direction scans the time-flipped input and its outputs are flipped back) —
    numerically the same recurrence, half the sequential scans. With
    ``fused="pallas"`` the merged recurrence runs as ONE Pallas kernel
    (`ops.pallas.lstm.lstm_multi_pallas`) instead of a `lax.scan`.
    """
    if fused:
        xs = jnp.stack([x, x[..., ::-1]])
        w_ih = jnp.stack([p["w_ih"], p["w_ih_rev"]])
        w_hh = jnp.stack([p["w_hh"], p["w_hh_rev"]])
        bias = jnp.stack([p["b_ih"] + p["b_hh"], p["b_ih_rev"] + p["b_hh_rev"]])
        if fused == "pallas":
            from volpick_tpu.ops.pallas.lstm import lstm_multi_pallas

            hs = lstm_multi_pallas(
                xs, w_ih, w_hh, bias,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            hs = lstm_multi(xs, w_ih, w_hh, bias)
        return jnp.concatenate([hs[0], hs[1][..., ::-1]], axis=1)
    fwd = lstm(x, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"])
    bwd = lstm(x, p["w_ih_rev"], p["w_hh_rev"], p["b_ih_rev"], p["b_hh_rev"], reverse=True)
    return jnp.concatenate([fwd, bwd], axis=1)


def seq_self_attention(
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    attention_width: Optional[int] = None,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Additive (Bahdanau-style) self-attention over (B, C, T).

    The nonstandard parameterization matches the reference weights
    (`transformer_d0.attention.{Wx,Wt,bh,Wa,ba}`, SURVEY §2.5): for query step
    t and key step s, e[t,s] = Wa·tanh(x_t·Wt + x_s·Wx + bh) + ba, softmax over
    s with numerically-stable max subtraction and an `eps` added to the
    denominator; optional band mask of `attention_width` around the diagonal.
    Returns (values (B, C, T), attention (B, T, T)).
    """
    xt = x.transpose(0, 2, 1)  # (B, T, C)
    q = xt @ p["Wt"]  # (B, T, U)
    k = xt @ p["Wx"]  # (B, T, U)
    h = jnp.tanh(q[:, :, None, :] + k[:, None, :, :] + p["bh"])  # (B, T, T, U)
    e = (h @ p["Wa"])[..., 0] + p["ba"][0]  # (B, T, T)
    e = e - jnp.max(e, axis=-1, keepdims=True)
    e = jnp.exp(e)
    if attention_width is not None:
        t = x.shape[-1]
        idx = jnp.arange(t)
        lower = idx - attention_width // 2
        upper = lower + attention_width
        mask = (idx[None, :] >= lower[:, None]) & (idx[None, :] < upper[:, None])
        e = jnp.where(mask[None], e, 0.0)
    a = e / (jnp.sum(e, axis=-1, keepdims=True) + eps)
    v = a @ xt  # (B, T, C)
    return v.transpose(0, 2, 1), a


def seq_self_attention_banded(
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    attention_width: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Banded additive self-attention: computes ONLY the `attention_width`
    diagonals of `seq_self_attention`'s (B, T, T) energy matrix — W·B·T·U
    tanh evaluations instead of B·T²·U (15.7× fewer at W=3, T=47). The
    dense path evaluates the full matrix and masks afterwards
    (the keras SeqSelfAttention semantics the reference's pick branches
    inherit via SeisBench).

    Deviation from the dense path: the numerically-stabilizing max is taken
    over the BAND instead of the full row. The subtraction itself cancels in
    the softmax ratio; it survives only through the `+eps` in the
    denominator, scaled by exp(max_band − max_row) ≤ 1 — i.e. the banded
    result differs from the dense one by O(eps) in the attention weights
    (equality is pinned at 1e-5 on the shipped weights by
    tests/test_model_parity.py). Returns values only (B, C, T).
    """
    b, c, t = x.shape
    xt = x.transpose(0, 2, 1)  # (B, T, C)
    q = xt @ p["Wt"] + p["bh"]  # (B, T, U); fold bh into the query once
    k = xt @ p["Wx"]  # (B, T, U)
    lo = -(attention_width // 2)
    offsets = range(lo, lo + attention_width)
    idx = jnp.arange(t)
    raws, valids, vals = [], [], []
    for d in offsets:
        # k and x shifted by d with zero padding; validity mask kills pads
        kd = jnp.roll(k, -d, axis=1)
        xd = jnp.roll(xt, -d, axis=1)
        valid = (idx + d >= 0) & (idx + d < t)  # (T,)
        raw = jnp.tanh(q + kd) @ p["Wa"] + p["ba"][0]  # (B, T, 1)
        raws.append(raw[..., 0])
        valids.append(valid)
        vals.append(xd)
    raw = jnp.stack(raws, axis=-1)  # (B, T, W)
    valid = jnp.stack(valids, axis=-1)[None]  # (1, T, W)
    m = jnp.max(jnp.where(valid, raw, -jnp.inf), axis=-1, keepdims=True)
    e = jnp.where(valid, jnp.exp(raw - m), 0.0)  # (B, T, W)
    a = e / (jnp.sum(e, axis=-1, keepdims=True) + eps)
    v = jnp.einsum("btw,bwtc->btc", a, jnp.stack(vals, axis=1))
    return v.transpose(0, 2, 1)
