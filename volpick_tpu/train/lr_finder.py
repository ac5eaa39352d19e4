"""Learning-rate finder (the reference's Tuner.lr_find path, `train.py:194-205`).

Exponential LR sweep from min_lr to max_lr over num_training steps; the
suggested LR is the point of steepest smoothed-loss descent, matching the
Lightning tuner's suggestion rule. Training state is thrown away afterwards.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import numpy as np


def lr_find(
    trainer,
    train_gen,
    min_lr: float = 1e-5,
    max_lr: float = 1e-2,
    num_training: int = 200,
    smooth: float = 0.05,
    diverge_factor: float = 4.0,
) -> Dict:
    """Returns {"suggestion": lr, "lrs": [...], "losses": [...]}. Does not
    mutate the trainer's parameters."""
    if trainer._train_step is None:
        trainer._build_steps()
    params = trainer.params
    opt_state = trainer.opt_state
    ema = trainer.ema_params
    lrs = np.exp(np.linspace(np.log(min_lr), np.log(max_lr), num_training))
    losses: List[float] = []
    rng = jax.random.PRNGKey(123)
    it = iter(train_gen.epoch())
    best = np.inf
    smoothed = None
    i = 0
    while i < num_training:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(train_gen.epoch())
            continue
        rng, sub = jax.random.split(rng)
        batch = jax.device_put(batch, trainer.batch_sharding)
        params, opt_state, ema, loss = trainer._train_step(
            params, opt_state, ema, batch, float(lrs[i]), sub
        )
        loss = float(loss)
        smoothed = loss if smoothed is None else smooth * loss + (1 - smooth) * smoothed
        losses.append(smoothed)
        best = min(best, smoothed)
        if smoothed > diverge_factor * best or not np.isfinite(smoothed):
            lrs = lrs[: len(losses)]
            break
        i += 1

    losses_a = np.asarray(losses)
    if len(losses_a) < 5:
        suggestion = float(np.sqrt(min_lr * max_lr))
    else:
        grad = np.gradient(losses_a)
        k = int(np.argmin(grad))
        suggestion = float(lrs[min(k, len(lrs) - 1)])
    return {"suggestion": suggestion, "lrs": list(map(float, lrs[: len(losses)])), "losses": losses}
