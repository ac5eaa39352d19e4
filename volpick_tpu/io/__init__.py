from volpick_tpu.io.miniseed import read_mseed
from volpick_tpu.core.sacio import read_sac, write_sac, read_sac_stream

__all__ = ["read_mseed", "read_sac", "write_sac", "read_sac_stream"]
