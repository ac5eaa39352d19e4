"""Training losses (reference `volpick/model/models.py:34-51` and `:539-549`)."""

from __future__ import annotations

import jax.numpy as jnp


def vector_cross_entropy(y_pred: jnp.ndarray, y_true: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """PhaseNet loss: −mean_batch Σ_class mean_time(y·log(ŷ+eps)).

    y_pred/y_true: (B, classes, W) probabilities."""
    h = y_true * jnp.log(y_pred + eps)
    h = jnp.mean(h, axis=-1)  # mean over time
    h = jnp.sum(h, axis=-1)  # sum over classes
    return -jnp.mean(h)  # mean over batch


def bce(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Binary cross entropy on probabilities (torch BCELoss semantics: clamped
    log, mean reduction)."""
    pred = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(pred) + (1.0 - target) * jnp.log(1.0 - pred))


def weighted_bce(
    det_pred, p_pred, s_pred, det_true, p_true, s_true, weights=(0.05, 0.40, 0.55)
) -> jnp.ndarray:
    """EQTransformer loss: weighted BCE over (detection, P, S) branches."""
    return (
        weights[0] * bce(det_pred, det_true)
        + weights[1] * bce(p_pred, p_true)
        + weights[2] * bce(s_pred, s_true)
    )


def vol_eqt_loss(
    rg_pred, lp_pred, p_pred, s_pred, rg_true, lp_true, p_true, s_true,
    weights=(0.05, 0.05, 0.45, 0.45),
):
    """VolEQTransformer loss: weighted BCE over (regular detection, LP
    detection, P, S). The reference's commented shared_step
    (`volpick/model/models.py:963-976`) applies loss_weights[0] to both
    detection heads and [1]/[2] to P/S; here each head gets its own weight
    with the same defaults, which is identical for the shipped
    (0.05, 0.05, 0.45, 0.45)."""
    return (
        weights[0] * bce(rg_pred, rg_true)
        + weights[1] * bce(lp_pred, lp_true)
        + weights[2] * bce(p_pred, p_true)
        + weights[3] * bce(s_pred, s_true)
    )
