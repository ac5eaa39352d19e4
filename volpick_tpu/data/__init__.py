from volpick_tpu.data.dataset import WaveformDataset, VCSEIS, load_dataset
from volpick_tpu.data.writer import WaveformDataWriter
from volpick_tpu.data.assemble import assemble_datasets, generate_chunk_file, repack_dataset

__all__ = [
    "WaveformDataset",
    "VCSEIS",
    "load_dataset",
    "WaveformDataWriter",
    "assemble_datasets",
    "generate_chunk_file",
    "repack_dataset",
]
