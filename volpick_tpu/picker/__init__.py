from volpick_tpu.picker.annotate import WaveformPicker

__all__ = ["WaveformPicker"]
