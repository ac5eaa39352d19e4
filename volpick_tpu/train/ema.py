"""EMA and SWA weight averaging as functional pytree transforms.

The reference wraps the optimizer in an `EMAOptimizer` (decay 0.999, updated
every step; `volpick/model/ema.py:214-418`) and optionally applies PyTorch
Lightning's StochasticWeightAveraging. Here both are two-line pytree updates
applied inside the jitted train step (EMA) or at epoch boundaries (SWA) — the
TPU-native equivalent, with no streams/threads needed since the update fuses
into the step program.
"""

from __future__ import annotations

import jax


def ema_update(ema_params, params, decay: float = 0.999):
    """ema ← decay·ema + (1−decay)·params (reference `ema.py:195-202`)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )


def swa_update(swa_params, params, n_models: int):
    """Running average: swa ← (swa·n + params)/(n+1)."""
    return jax.tree_util.tree_map(
        lambda a, p: (a * n_models + p) / (n_models + 1), swa_params, params
    )
