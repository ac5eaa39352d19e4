"""Batched on-device training augmentations (the reference's program, §2.6).

The reference runs this per-sample in numpy inside torch DataLoader workers
(reference `volpick/model/models.py:399-419` + `volpick/model/augmentations.py`);
here the whole program is a single jittable function over fixed-shape batches,
driven by an explicit PRNG key — it fuses with the forward pass and runs on
the TPU's VPU, eliminating the host augmentation bottleneck.

Program (train): window selection → probabilistic labels (+detection labels)
→ normalize → event stacking (superimpose / duplicate-self / none) → noise
stacking (noise superimpose / gaussian / none) → gaps → final normalize.

Faithful behaviors (citations into /root/reference):
- window block: OneOf([WindowAroundSample(samples_before, pre_window, pad),
  Null], p=[2,1]) → RandomWindow(window, pad) (`models.py:221-265`);
- SuperimposeEvent (`augmentations.py:147-310`): tail of the current trace
  zeroed after first_event_end = max(onsets) + max(1.4·(max−min), sep) +
  0.2·sep (two onsets) or max+1+sep (one); secondary event required to have
  its P-label peak ≈ 1; secondary zeroed before P−sep; P shifted to
  U[first_event_end, n−2·sep); amplitude × 1/U(inv_scale); labels max-merged
  then phases /= max(1, Σ), noise = 1 − Σ (`label_normalization_method1`,
  `augmentations.py:16-18`); channels that are all-zero in the primary stay
  zero; second event (p=0.3) placed after the first's max onset + 1 + sep;
- MyDuplicateEvent (`augmentations.py:312-542`): the secondary is a copy of
  the trace itself (taken before tail-zeroing), placement range
  U[first_event_end, n−sep);
- noise mode: x += 1/U(2,50) · max|x| · noise_trace (`augmentations.py:150-163`);
- GaussianNoise: x += N(0,1)·U(0, 0.15);
- AddGap(p=0.2): a random span is zeroed in x; label rows are zeroed in the
  gap and the noise row (when present) is set to 1 there.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from volpick_tpu.ops.labels import detection_labels, probabilistic_labels
from volpick_tpu.ops.signal import demean, detrend_linear, normalize_amplitude


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    window: int = 3001
    pre_window: int = 6000
    samples_before: int = 3000
    window_around_prob: float = 2.0 / 3.0
    selection: str = "random"  # onset used by WindowAroundSample
    # RandomWindow low/high sample boundaries (`models.py:245-250` sample_boundaries)
    low: Optional[int] = None
    high: Optional[int] = None
    label_shape: str = "gaussian"
    sigma: float = 20.0
    noise_column: bool = True
    detection: bool = False
    detection_factor: float = 1.4
    detection_fixed_window: Optional[int] = None
    norm: str = "peak"
    detrend: bool = False
    # stacking
    stack: bool = False
    inv_scale_event: Tuple[float, float] = (0.25, 4.0)
    inv_scale_noise: Tuple[float, float] = (2.0, 50.0)
    sep: int = 200
    tail_length_factor: float = 1.4
    p_event_modes: Tuple[float, float, float] = (0.2, 0.2, 0.6)  # superimpose/duplicate/none
    p_noise_modes: Tuple[float, float, float] = (0.25, 0.25, 0.5)  # noise-superimpose/gaussian/none
    p_two_events: float = 0.3
    gaussian_scale: Tuple[float, float] = (0.0, 0.15)
    gap_prob: float = 0.2
    rotate_array: bool = False  # RandomArrayRotation gate (`models.py:330-343`)
    rotate_prob: float = 0.99
    # window selection already performed on host (generator host_window path):
    # the device window block degenerates to an identity gather at offset 0
    pre_windowed: bool = False

    def for_secondary(self) -> "AugmentConfig":
        """Block1 config of the stacked-event sub-generator: always
        WindowAroundSample around the *first* onset with a wider pre-window
        (reference `models.py:277-279` PhaseNet: 1500/4000; `models.py:679-681`
        EQT: 3000/8000)."""
        if self.window >= 6000:  # EQT geometry
            return dataclasses.replace(
                self, samples_before=3000, pre_window=8000, window_around_prob=1.0, selection="first", stack=False
            )
        return dataclasses.replace(
            self, samples_before=1500, pre_window=4000, window_around_prob=1.0, selection="first", stack=False
        )


# ----------------------------------------------------------------- primitives
def shift_batch(x: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Per-sample integer shift along the last axis with zero fill.

    x: (B, ..., W); shift: (B,) int (positive → shift right)."""
    w = x.shape[-1]
    idx = jnp.arange(w)[None, :] - shift[:, None]  # (B, W) source index
    valid = (idx >= 0) & (idx < w)
    idx = jnp.clip(idx, 0, w - 1)
    expand = (slice(None),) + (None,) * (x.ndim - 2) + (slice(None),)
    gathered = jnp.take_along_axis(x, jnp.broadcast_to(idx[expand], x.shape), axis=-1)
    return jnp.where(valid[expand], gathered, 0.0)


def gather_window(x: jnp.ndarray, lens: jnp.ndarray, offsets: jnp.ndarray, window: int) -> jnp.ndarray:
    """Zero-padded window gather: x (B, C, Wraw), offsets (B,) may be negative
    or extend past lens; out-of-trace samples are zero ("pad" strategy)."""
    b, c, w_raw = x.shape
    idx = offsets[:, None] + jnp.arange(window)[None, :]  # (B, window)
    valid = (idx >= 0) & (idx < lens[:, None]) & (idx < w_raw)
    idx_c = jnp.clip(idx, 0, w_raw - 1)
    gathered = jnp.take_along_axis(x, jnp.broadcast_to(idx_c[:, None, :], (b, c, window)), axis=-1)
    return jnp.where(valid[:, None, :], gathered, 0.0)


def _uniform_int(key, lo, hi, shape):
    """Per-element randint in [lo, hi) with traced per-sample bounds (hi > lo assumed where used)."""
    u = jax.random.uniform(key, shape)
    span = jnp.maximum(hi - lo, 1)
    return lo + jnp.floor(u * span).astype(jnp.int32)


# ---------------------------------------------------------------- window block
def select_window_offsets(
    key: jax.Array, lens: jnp.ndarray, p: jnp.ndarray, s: jnp.ndarray, cfg: AugmentConfig
) -> jnp.ndarray:
    """Absolute window start offsets implementing block1's window program."""
    b = lens.shape[0]
    if cfg.pre_windowed:  # host already selected the window (host_window_crop)
        return jnp.zeros((b,), jnp.int32)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    has_p = ~jnp.isnan(p)
    has_s = ~jnp.isnan(s)
    if cfg.selection == "first":
        base = jnp.where(has_p, jnp.nan_to_num(p, nan=jnp.inf), jnp.inf)
        base = jnp.minimum(base, jnp.where(has_s, jnp.nan_to_num(s, nan=jnp.inf), jnp.inf))
        onset = jnp.where(jnp.isfinite(base), base, 0.0)
    else:  # random among present picks
        pick_s = jax.random.bernoulli(k1, 0.5, (b,))
        both = has_p & has_s
        use_s = (both & pick_s) | (has_s & ~has_p)
        onset = jnp.where(use_s, jnp.nan_to_num(s), jnp.nan_to_num(p))
    # noise traces: random position stands in for the missing onset
    rand_pos = jax.random.uniform(k2, (b,)) * lens.astype(jnp.float32)
    onset = jnp.where(has_p | has_s, onset, rand_pos)

    # WindowAroundSample: start at onset - samples_before (pre_window long)
    was_start = onset.astype(jnp.int32) - cfg.samples_before
    gate = jax.random.bernoulli(k3, cfg.window_around_prob, (b,))

    # RandomWindow(window) within the intermediate view
    u = jax.random.uniform(k4, (b,))
    # gated branch: current view = [was_start, was_start + pre_window)
    span_was = max(cfg.pre_window - cfg.window, 0)
    off_was = was_start + jnp.floor(u * (span_was + 1)).astype(jnp.int32)
    # null branch: current view = full trace clipped to [low, high)
    lo = cfg.low if cfg.low is not None else 0
    hi = lens.astype(jnp.int32) if cfg.high is None else jnp.minimum(lens.astype(jnp.int32), cfg.high)
    span_null = jnp.maximum(hi - lo - cfg.window, 0)
    off_null = lo + jnp.floor(u * (span_null + 1).astype(jnp.float32)).astype(jnp.int32)
    return jnp.where(gate, off_was, off_null)


def window_and_label(
    key: jax.Array,
    x: jnp.ndarray,
    lens: jnp.ndarray,
    p: jnp.ndarray,
    s: jnp.ndarray,
    cfg: AugmentConfig,
) -> Dict[str, jnp.ndarray]:
    """Block1: window selection + labels + conditioning. Returns a dict with
    X (B,C,window), y, optional detections, and window-relative p/s onsets."""
    k1, k2 = jax.random.split(key)
    off = select_window_offsets(k1, lens, p, s, cfg)
    xw = gather_window(x, lens, off, cfg.window)
    p_w = p - off.astype(p.dtype)
    s_w = s - off.astype(s.dtype)
    onsets = jnp.stack([p_w, s_w], axis=1)
    y = probabilistic_labels(
        onsets, cfg.window, sigma=cfg.sigma, shape=cfg.label_shape, noise_column=cfg.noise_column
    )
    out = {"p": p_w, "s": s_w}
    if cfg.detection:
        out["detections"] = detection_labels(
            p_w, s_w, cfg.window, factor=cfg.detection_factor, fixed_window=cfg.detection_fixed_window
        )
    xw = detrend_linear(xw) if cfg.detrend else demean(xw)
    xw = normalize_amplitude(xw, norm=cfg.norm, per_channel=True)
    out["X"] = xw
    out["y"] = y
    return out


# ------------------------------------------------------------- stacking block
def _first_event_end(p: jnp.ndarray, s: jnp.ndarray, cfg: AugmentConfig) -> jnp.ndarray:
    has_p, has_s = ~jnp.isnan(p), ~jnp.isnan(s)
    pv, sv = jnp.nan_to_num(p), jnp.nan_to_num(s)
    hi = jnp.where(has_p & has_s, jnp.maximum(pv, sv), jnp.where(has_p, pv, sv))
    lo = jnp.where(has_p & has_s, jnp.minimum(pv, sv), hi)
    both = has_p & has_s
    fee_two = hi + jnp.maximum((hi - lo) * cfg.tail_length_factor, cfg.sep) + 0.2 * cfg.sep
    fee_one = hi + 1 + cfg.sep
    fee = jnp.where(both, fee_two, fee_one)
    has_any = has_p | has_s
    return jnp.where(has_any, fee, 0.0).astype(jnp.int32), has_any


def _renorm_labels(y: jnp.ndarray, noise_column: bool) -> jnp.ndarray:
    if not noise_column:
        return y
    phases = y[:, :-1]
    total = jnp.sum(phases, axis=1, keepdims=True)
    phases = phases / jnp.maximum(1.0, total)
    noise = 1.0 - jnp.sum(phases, axis=1, keepdims=True)
    return jnp.concatenate([phases, noise], axis=1)


def stack_block(
    key: jax.Array,
    prim: Dict[str, jnp.ndarray],
    sec: Dict[str, jnp.ndarray],
    sec2: Dict[str, jnp.ndarray],
    noise_x: jnp.ndarray,
    noise2_x: jnp.ndarray,
    cfg: AugmentConfig,
) -> Dict[str, jnp.ndarray]:
    """Event-stacking then noise-stacking OneOf gates, fully batched."""
    b = prim["X"].shape[0]
    keys = jax.random.split(key, 10)
    mode_e = jax.random.choice(keys[0], 3, (b,), p=jnp.asarray(cfg.p_event_modes))
    two_events = jax.random.bernoulli(keys[1], cfg.p_two_events, (b,))

    fee, has_event = _first_event_end(prim["p"], prim["s"], cfg)
    do_stack = (mode_e < 2) & has_event  # superimpose or duplicate, event traces only
    # duplicate-self requires a contained P pick of the primary itself
    dup_ok = jnp.max(prim["y"][:, 0], axis=-1) > 0.99
    do_stack = do_stack & jnp.where(mode_e == 1, dup_ok, True)

    # duplicate-self secondary = the window *before* tail zeroing
    pre_zero = {"X": prim["X"], "y": prim["y"]}
    if cfg.detection and "detections" in prim:
        pre_zero["detections"] = prim["detections"]

    # tail zeroing happens whenever a stacking mode was drawn for an event trace
    n = cfg.window
    t = jnp.arange(n)[None, :]
    keep = t < fee[:, None]
    x = jnp.where(do_stack[:, None, None], prim["X"] * keep[:, None, :], prim["X"])
    prim = dict(prim, X=x)

    # mode 0: secondary from the eq sub-generator; mode 1: self-copy
    sec_eff = {}
    for k in pre_zero:
        if k in sec:
            sec_eff[k] = jnp.where((mode_e == 1)[:, None, None], pre_zero[k], sec[k])
    margin = jnp.where(mode_e == 1, cfg.sep, 2 * cfg.sep)

    # pass 1
    prim1, fee1 = _superimpose_pass_dynamic(keys[2], prim, sec_eff, fee, do_stack, cfg, margin)
    # pass 2 (only when two events drawn; duplicate reuses the same self copy)
    sec2_eff = {}
    for k in sec_eff:
        sec2_eff[k] = jnp.where((mode_e == 1)[:, None, None], sec_eff[k], sec2[k])
    prim2, _ = _superimpose_pass_dynamic(keys[3], prim1, sec2_eff, fee1, do_stack & two_events, cfg, margin)

    # ---- noise gate
    mode_n = jax.random.choice(keys[4], 3, (b,), p=jnp.asarray(cfg.p_noise_modes))
    two_noise = jax.random.bernoulli(keys[5], cfg.p_two_events, (b,))
    x = prim2["X"]
    alive = jnp.any(jnp.abs(x) > 1e-12, axis=-1, keepdims=True)

    def add_noise(k, xx, nx, act):
        scale = (
            1.0
            / jax.random.uniform(k, (b,), minval=cfg.inv_scale_noise[0], maxval=cfg.inv_scale_noise[1])
            * jnp.max(jnp.abs(xx), axis=(1, 2))
        )
        nx = nx * alive
        return jnp.where(act[:, None, None], xx + scale[:, None, None] * nx, xx)

    x = add_noise(keys[6], x, noise_x, mode_n == 0)
    x = add_noise(keys[7], x, noise2_x, (mode_n == 0) & two_noise)
    g_scale = jax.random.uniform(keys[8], (b,), minval=cfg.gaussian_scale[0], maxval=cfg.gaussian_scale[1])
    gnoise = jax.random.normal(keys[9], x.shape) * g_scale[:, None, None]
    x = jnp.where((mode_n == 1)[:, None, None], x + gnoise, x)

    out = dict(prim2)
    out["X"] = x
    return out


def _superimpose_pass_dynamic(key, prim, sec, fee, active, cfg, margin):
    """_superimpose_pass with per-sample placement margin (duplicate vs event)."""
    n = cfg.window
    k1, k2 = jax.random.split(key)
    x, y = prim["X"], prim["y"]
    x2, y2 = sec["X"], sec["y"]

    hi = n - margin  # (B,) per-sample placement upper bound (exclusive)
    # feasibility uses 2·sep for BOTH modes (reference: superimpose breaks at
    # fee >= n - 2·sep, `augmentations.py:198-200`; duplicate at
    # fee + 2·sep >= n, `augmentations.py:458`) while the duplicate's
    # placement range extends to n - sep (`augmentations.py:474-476`)
    feasible = fee < n - 2 * cfg.sep
    p_peak_ok = jnp.max(y2[:, 0], axis=-1) > 0.99
    active = active & feasible & p_peak_ok

    original_pick = jnp.argmax(y2[:, 0], axis=-1).astype(jnp.int32)
    t = jnp.arange(n)[None, :]
    keep2 = t >= jnp.maximum(original_pick - cfg.sep, 0)[:, None]
    x2 = x2 * keep2[:, None, :]

    shifted_pick = _uniform_int(k1, fee, hi, fee.shape)
    shift = shifted_pick - original_pick
    x2s = shift_batch(x2, shift)
    y2s = shift_batch(y2, shift)

    prim_alive = jnp.any(jnp.abs(x) > 1e-12, axis=-1, keepdims=True)
    x2s = x2s * prim_alive

    scale = 1.0 / jax.random.uniform(
        k2, fee.shape, minval=cfg.inv_scale_event[0], maxval=cfg.inv_scale_event[1]
    )
    m = active[:, None, None]
    out = dict(prim)
    out["X"] = jnp.where(m, x + scale[:, None, None] * x2s, x)
    out["y"] = jnp.where(m, _renorm_labels(jnp.maximum(y, y2s), cfg.noise_column), y)
    if cfg.detection and "detections" in prim and "detections" in sec:
        d2s = shift_batch(sec["detections"], shift)
        out["detections"] = jnp.where(m, jnp.maximum(prim["detections"], d2s), prim["detections"])

    n_phase = y2s.shape[1] - (1 if cfg.noise_column else 0)
    placed_onset = jnp.max(jnp.argmax(y2s[:, :n_phase], axis=-1), axis=-1)
    fee_new = jnp.where(active, jnp.maximum(fee, placed_onset.astype(jnp.int32) + 1 + cfg.sep), fee)
    return out, fee_new


# ------------------------------------------------------------- rotation block
def rotation_block(key: jax.Array, out: Dict[str, jnp.ndarray], cfg: AugmentConfig) -> Dict[str, jnp.ndarray]:
    """RandomArrayRotation: circular roll of X, y (and detections) along time
    by a per-sample random shift (OneOf gate p=rotate_prob)."""
    b = out["X"].shape[0]
    n = cfg.window
    k1, k2 = jax.random.split(key)
    do = jax.random.bernoulli(k1, cfg.rotate_prob, (b,))
    shift = jax.random.randint(k2, (b,), 0, n)
    idx = (jnp.arange(n)[None, :] - shift[:, None]) % n  # (B, W)

    def roll(a):
        g = jnp.take_along_axis(a, jnp.broadcast_to(idx[:, None, :], a.shape), axis=-1)
        return jnp.where(do[:, None, None], g, a)

    res = dict(out)
    res["X"] = roll(out["X"])
    res["y"] = roll(out["y"])
    if cfg.detection and "detections" in out:
        res["detections"] = roll(out["detections"])
    return res


# ------------------------------------------------------------------ gap block
def gap_block(key: jax.Array, out: Dict[str, jnp.ndarray], cfg: AugmentConfig) -> Dict[str, jnp.ndarray]:
    b = out["X"].shape[0]
    n = cfg.window
    k1, k2, k3 = jax.random.split(key, 3)
    do_gap = jax.random.bernoulli(k1, cfg.gap_prob, (b,))
    g0 = _uniform_int(k2, jnp.zeros((b,), jnp.int32), jnp.full((b,), n, jnp.int32), (b,))
    g1 = _uniform_int(k3, g0, jnp.full((b,), n, jnp.int32), (b,))
    t = jnp.arange(n)[None, :]
    in_gap = (t >= g0[:, None]) & (t < g1[:, None]) & do_gap[:, None]
    x = jnp.where(in_gap[:, None, :], 0.0, out["X"])
    y = jnp.where(in_gap[:, None, :], 0.0, out["y"])
    if cfg.noise_column:
        noise_row = jnp.where(in_gap, 1.0, out["y"][:, -1])
        y = y.at[:, -1].set(noise_row)
    res = dict(out, X=x, y=y)
    if cfg.detection and "detections" in out:
        res["detections"] = jnp.where(in_gap[:, None, :], 0.0, out["detections"])
    return res


# --------------------------------------------------------------- full program
@partial(jax.jit, static_argnames=("cfg",))
def augment_train_batch(
    key: jax.Array,
    prim_raw: Dict[str, jnp.ndarray],
    sec_raw: Optional[Dict[str, jnp.ndarray]],
    sec2_raw: Optional[Dict[str, jnp.ndarray]],
    noise_raw: Optional[Dict[str, jnp.ndarray]],
    noise2_raw: Optional[Dict[str, jnp.ndarray]],
    cfg: AugmentConfig,
) -> Dict[str, jnp.ndarray]:
    """The full training augmentation program on device.

    Raw dicts: {"x": (B, C, Wraw) float32, "len": (B,) int32,
    "p"/"s": (B,) float32 with NaN for absent}. Secondary/noise batches are
    independent draws from the eq / noise subsets (host's job). Returns
    {"X", "y"[, "detections"]} at float32.
    """
    ks = jax.random.split(key, 8)
    prim = window_and_label(ks[0], prim_raw["x"], prim_raw["len"], prim_raw["p"], prim_raw["s"], cfg)

    if cfg.stack and sec_raw is not None:
        sec_cfg = cfg.for_secondary()
        sec = window_and_label(ks[1], sec_raw["x"], sec_raw["len"], sec_raw["p"], sec_raw["s"], sec_cfg)
        sec2 = window_and_label(ks[2], sec2_raw["x"], sec2_raw["len"], sec2_raw["p"], sec2_raw["s"], sec_cfg)
        noi = window_and_label(ks[3], noise_raw["x"], noise_raw["len"], noise_raw["p"], noise_raw["s"], cfg)
        noi2 = window_and_label(ks[4], noise2_raw["x"], noise2_raw["len"], noise2_raw["p"], noise2_raw["s"], cfg)
        prim = stack_block(ks[5], prim, sec, sec2, noi["X"], noi2["X"], cfg)

    if cfg.rotate_array:
        prim = rotation_block(ks[7], prim, cfg)
    prim = gap_block(ks[6], prim, cfg)

    # final re-normalize (reference `models.py:408-412`)
    x = demean(prim["X"])
    x = normalize_amplitude(x, norm=cfg.norm, per_channel=True)
    out = {"X": x.astype(jnp.float32), "y": prim["y"].astype(jnp.float32)}
    if cfg.detection and "detections" in prim:
        out["detections"] = prim["detections"].astype(jnp.float32)
    if "is_lp" in prim_raw:
        # per-trace source-type flag rides along unchanged (windowing/
        # stacking never reorders rows); VolEQTransformer's loss gates its
        # two detection heads with it (EventTypeDetectionLabeller semantics)
        out["is_lp"] = jnp.asarray(prim_raw["is_lp"], jnp.float32)
    return out
