"""volpick_tpu — TPU-native deep-learning P/S phase picking for volcano seismicity.

A brand-new JAX/XLA/Pallas framework with the capabilities of the volpick
reference stack (zhong-yy/volpick + the SeisBench surface it relies on):

- ``volpick_tpu.core``    : host-side waveform containers (Stream/Trace), picks, config
- ``volpick_tpu.ops``     : fixed-shape on-device signal kernels (windows, stacking,
                            triggers, labels, SNR / frequency index)
- ``volpick_tpu.models``  : PhaseNet & EQTransformer trunks in JAX + torch weight import
- ``volpick_tpu.pipeline``: batched on-device augmentation/label generator
- ``volpick_tpu.train``   : pjit data-parallel trainer (EMA/SWA, warmup, plateau LR)
- ``volpick_tpu.data``    : SeisBench-format-compatible HDF5+CSV waveform datasets
- ``volpick_tpu.eval``    : task0 / task1 / task2 / task3 evaluation harness
- ``volpick_tpu.parallel``: mesh / sharding helpers

Reference behavior is documented per-module with `/root/reference` file:line
citations; the implementation is TPU-first, not a port.
"""

import logging
import os

__version__ = "0.1.0"

cache_root = os.path.expanduser(
    os.environ.get("VOLPICK_TPU_CACHE_ROOT", "~/.cache/volpick_tpu")
)

logger = logging.getLogger("volpick_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    )
    logger.addHandler(_h)
logger.setLevel(logging.INFO)


def enable_compilation_cache(cache_dir: str | None = None):
    """Turn on JAX's persistent compilation cache (big win for TPU sessions:
    the fused classify/train programs compile once per machine, not per
    process). Called automatically by the trainer and bench entry points;
    set VOLPICK_TPU_NO_COMPILE_CACHE=1 to disable."""
    if os.environ.get("VOLPICK_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = cache_dir or os.path.join(cache_root, "jaxcache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
