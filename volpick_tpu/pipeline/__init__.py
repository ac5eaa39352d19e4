from volpick_tpu.pipeline.augmentations import AugmentConfig, augment_train_batch, window_and_label
from volpick_tpu.pipeline.generator import TrainGenerator, RawBatchSource, eval_batch

__all__ = [
    "AugmentConfig",
    "augment_train_batch",
    "window_and_label",
    "TrainGenerator",
    "RawBatchSource",
    "eval_batch",
]
