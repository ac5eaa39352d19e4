from volpick_tpu.picker.annotate import WaveformPicker

__all__ = ["WaveformPicker"]
from volpick_tpu.picker.streaming import StreamingPicker

__all__.append("StreamingPicker")
