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


def _is_bn_stat(path) -> bool:
    """True for BatchNorm running-statistic leaves ('mean'/'var' dict keys).

    The reference EMAs *optimizer parameters only* — BN running statistics
    are not optimizer state in torch and are carried over as-is
    (`volpick/model/ema.py:195-202` iterates optimizer param groups). Our
    params pytree stores BN stats inline, so they must be excluded from the
    average and tracked from the live model instead."""
    if not path:
        return False
    last = path[-1]
    key = getattr(last, "key", None)
    return key in ("mean", "var")


def ema_update(ema_params, params, decay: float = 0.999):
    """ema ← decay·ema + (1−decay)·params for optimizer parameters;
    BN running stats copy straight from `params` (reference `ema.py:195-202`
    averages only what the optimizer owns)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, e, p: p if _is_bn_stat(path) else decay * e + (1.0 - decay) * p,
        ema_params,
        params,
    )


def swa_update(swa_params, params, n_models: int):
    """Running average: swa ← (swa·n + params)/(n+1)."""
    return jax.tree_util.tree_map(
        lambda a, p: (a * n_models + p) / (n_models + 1), swa_params, params
    )
