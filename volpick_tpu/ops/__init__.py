from volpick_tpu.ops.signal import demean, detrend_linear, normalize_amplitude, normalize
from volpick_tpu.ops.windows import (
    window_starts,
    frame_windows,
    overlap_stack,
    steered_window_indices,
)
from volpick_tpu.ops.triggers import trigger_onset_numpy, extract_picks_batched
from volpick_tpu.ops.labels import probabilistic_labels, detection_labels
from volpick_tpu.ops.features import frequency_index, snr_db

__all__ = [
    "demean",
    "detrend_linear",
    "normalize_amplitude",
    "normalize",
    "window_starts",
    "frame_windows",
    "overlap_stack",
    "steered_window_indices",
    "trigger_onset_numpy",
    "extract_picks_batched",
    "probabilistic_labels",
    "detection_labels",
    "frequency_index",
    "snr_db",
]
