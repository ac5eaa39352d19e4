from volpick_tpu.core.stream import UTC, Trace, Stream
from volpick_tpu.core.picks import Pick, PickList, Detection, ClassifyOutput

__all__ = ["UTC", "Trace", "Stream", "Pick", "PickList", "Detection", "ClassifyOutput"]
