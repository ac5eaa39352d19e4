from volpick_tpu.core.stream import UTC, Trace, Stream
from volpick_tpu.core.picks import Pick, PickList, Detection, ClassifyOutput
from volpick_tpu.core.interop import from_obspy, to_obspy

__all__ = ["UTC", "Trace", "Stream", "Pick", "PickList", "Detection", "ClassifyOutput", "from_obspy", "to_obspy"]
