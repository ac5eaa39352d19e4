"""Multi-chunk dataset assembly (reference `volpick/data/utils.py:117-139`).

A dataset directory holds one or more (metadata{chunk}.csv, waveforms{chunk}.hdf5)
pairs plus a `chunks` index file listing the chunk suffixes.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Dict, List, Sequence, Union


def generate_chunk_file(dataset_dir: Union[str, Path]) -> List[str]:
    """(Re)create the `chunks` index from the metadata files present."""
    dataset_dir = Path(dataset_dir)
    chunks = sorted(
        p.name[len("metadata") : -len(".csv")] for p in dataset_dir.glob("metadata*.csv")
    )
    with open(dataset_dir / "chunks", "w") as f:
        f.write("\n".join(chunks) + ("\n" if chunks else ""))
    return chunks


def assemble_datasets(
    source_dirs: Dict[Union[str, Path], Sequence[str]],
    dest_dir: Union[str, Path],
    link: bool = False,
) -> List[str]:
    """Copy (or hard-link) chunk file pairs from several datasets into one.

    source_dirs: {dataset_dir: [chunk suffixes to take]} (empty sequence =
    all chunks present). Returns the final chunk list of the destination.
    """
    dest_dir = Path(dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    for src, chunks in source_dirs.items():
        src = Path(src)
        if not chunks:
            chunks = [
                p.name[len("metadata") : -len(".csv")] for p in sorted(src.glob("metadata*.csv"))
            ]
        for chunk in chunks:
            for stem, suffix in (("metadata", ".csv"), ("waveforms", ".hdf5")):
                s = src / f"{stem}{chunk}{suffix}"
                d = dest_dir / f"{stem}{chunk}{suffix}"
                if not s.exists():
                    raise FileNotFoundError(s)
                if link:
                    if d.exists():
                        d.unlink()
                    try:
                        d.hardlink_to(s)
                    except OSError:
                        shutil.copy2(s, d)
                else:
                    shutil.copy2(s, d)
    return generate_chunk_file(dest_dir)
