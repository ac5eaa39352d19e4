from volpick_tpu.models.phasenet import PhaseNet
from volpick_tpu.models.eqtransformer import EQTransformer, VolEQTransformer
from volpick_tpu.models.tpupicknet import TPUPickNet
from volpick_tpu.models.registry import from_pretrained, load_model

__all__ = ["PhaseNet", "EQTransformer", "VolEQTransformer", "TPUPickNet", "from_pretrained", "load_model"]
