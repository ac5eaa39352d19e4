"""Pick-label painting kernels (Gaussian / triangle / box) + detection labels.

Replaces SeisBench's ProbabilisticLabeller and DetectionLabeller as used by the
reference training pipeline (reference `volpick/model/models.py:399-419` and
`models.py:618-627`). The reference paints labels per sample in DataLoader
workers; here labels are painted for a whole batch on device from (B, n_phases)
onset-sample arrays, fully vectorized and fusable with the rest of the
augmentation program.

Conventions: onsets are float sample indices (window-relative; may be
negative or beyond the window — the in-window tail is still painted); NaN
marks "no pick of this phase in this window". Output is (B, n_classes, W)
with the class order of the model (PhaseNet: "PSN" noise row last; EQT: "PS").
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _phase_curve(
    dist: jnp.ndarray, shape: str, sigma: float
) -> jnp.ndarray:
    """Label value as a function of |t - onset| (in samples)."""
    if shape == "gaussian":
        return jnp.exp(-(dist**2) / (2 * sigma**2))
    elif shape == "triangle":
        # Triangle of half-width sigma; the reference doubles sigma for
        # triangles to roughly match the gaussian support (`models.py:154-155`).
        return jnp.clip(1.0 - jnp.abs(dist) / sigma, 0.0, 1.0)
    elif shape == "box":
        return (jnp.abs(dist) <= sigma).astype(jnp.float32)
    else:
        raise ValueError(f"unknown label shape {shape!r}")


def probabilistic_labels(
    onsets: jnp.ndarray,
    window: int,
    sigma: float = 20.0,
    shape: str = "gaussian",
    noise_column: bool = True,
) -> jnp.ndarray:
    """Paint per-phase probability labels.

    onsets: (B, n_phases) float sample indices (NaN = absent). Returns
    (B, n_phases [+1], window): one curve per phase, plus — when noise_column —
    a trailing noise row = clip(1 - sum(phase rows), 0, 1), matching
    ProbabilisticLabeller(noise_column=True) for PhaseNet's "PSN" output
    (reference `models.py:251-258`) and noise_column=False for EQT.
    """
    b, n_phases = onsets.shape
    t = jnp.arange(window, dtype=jnp.float32)[None, None, :]
    onset_grid = onsets[:, :, None].astype(jnp.float32)
    dist = t - onset_grid
    curves = _phase_curve(dist, shape, float(sigma))
    # NaN marks an absent pick; onsets outside the window (including negative
    # window-relative positions) still paint their in-window tail, matching
    # the reference labeller
    present = ~jnp.isnan(onset_grid)
    curves = jnp.where(present, curves, 0.0)
    if noise_column:
        noise = jnp.clip(1.0 - jnp.sum(curves, axis=1, keepdims=True), 0.0, 1.0)
        curves = jnp.concatenate([curves, noise], axis=1)
    return curves


def renormalize_labels(y: jnp.ndarray) -> jnp.ndarray:
    """Re-normalize stacked labels: noise row (last) = clip(1 - sum(others), 0, 1).

    Mirrors the reference's `label_normalization_method1`
    (`volpick/model/augmentations.py:16-28`) applied after event superposition.
    """
    phases = y[..., :-1, :]
    noise = jnp.clip(1.0 - jnp.sum(phases, axis=-2, keepdims=True), 0.0, 1.0)
    return jnp.concatenate([phases, noise], axis=-2)


def detection_labels(
    p_onset: jnp.ndarray,
    s_onset: jnp.ndarray,
    window: int,
    factor: float = 1.4,
    fixed_window: Optional[int] = None,
) -> jnp.ndarray:
    """EQTransformer detection labels: 1 within [P, S + factor*(S-P)].

    With fixed_window set, the detection spans [P, P + fixed_window] instead
    (DetectionLabeller semantics; reference `models.py:618-627`). Inputs are
    (B,) float sample indices with NaN for absent picks; traces without both a
    P and (S or fixed_window) get an all-zero detection row.
    Returns (B, 1, window).
    """
    t = jnp.arange(window, dtype=jnp.float32)[None, :]
    p = p_onset[:, None].astype(jnp.float32)
    if fixed_window is not None:
        end = p + float(fixed_window)
        ok = ~jnp.isnan(p)
    else:
        s = s_onset[:, None].astype(jnp.float32)
        end = s + factor * (s - p)
        ok = ~jnp.isnan(p) & ~jnp.isnan(s)
    det = ((t >= p) & (t <= end)).astype(jnp.float32)
    det = jnp.where(ok, det, 0.0)
    return det[:, None, :]
