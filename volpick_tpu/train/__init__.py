from volpick_tpu.train.losses import vector_cross_entropy, weighted_bce
from volpick_tpu.train.trainer import Trainer, train
from volpick_tpu.train.schedules import PlateauScheduler, EarlyStopper, warmup_scale

__all__ = [
    "vector_cross_entropy",
    "weighted_bce",
    "Trainer",
    "train",
    "PlateauScheduler",
    "EarlyStopper",
    "warmup_scale",
]
