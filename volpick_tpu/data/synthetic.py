"""Synthetic VCSEIS-like dataset generation (fixtures, smoke training, bench).

Generates labeled 3-component event traces (VT-like high-frequency and LP-like
low-frequency) and noise traces in the exact on-disk format of the real
benchmark, so every downstream component (generators, trainer, eval harness)
can be exercised hermetically in CI where the real VCSEIS data is unavailable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

from volpick_tpu.data.writer import WaveformDataWriter


def _event_waveform(rng, n, sr, p_sample, s_sample, lp=False):
    t = np.arange(n) / sr
    tp, ts = p_sample / sr, s_sample / sr
    f_p, f_s = (3.0, 1.8) if lp else (9.0, 4.5)
    decay = 4.0 if lp else 1.5
    data = rng.normal(size=(3, n)) * 0.05
    rise = lambda t0, tau: (1 - np.exp(-np.clip(t - t0, 0, None) / tau)) * (t >= t0)
    env_p = rise(tp, 0.08) * np.exp(-np.clip(t - tp, 0, None) / decay)
    env_s = rise(ts, 0.12) * np.exp(-np.clip(t - ts, 0, None) / (decay * 1.6))
    amp = rng.uniform(0.5, 3.0)
    data[0] += np.sin(2 * np.pi * f_p * t + rng.uniform(0, 6)) * env_p * amp * 1.6
    data[1] += np.sin(2 * np.pi * f_p * t + rng.uniform(0, 6)) * env_p * amp * 0.5
    data[2] += np.sin(2 * np.pi * f_p * t + rng.uniform(0, 6)) * env_p * amp * 0.5
    data[1] += np.sin(2 * np.pi * f_s * t + rng.uniform(0, 6)) * env_s * amp * 2.2
    data[2] += np.sin(2 * np.pi * f_s * t + rng.uniform(0, 6)) * env_s * amp * 2.0
    data[0] += np.sin(2 * np.pi * f_s * t + rng.uniform(0, 6)) * env_s * amp * 0.7
    return data.astype(np.float32)


def make_synthetic_dataset(
    dest_dir: Union[str, Path],
    n_events: int = 64,
    n_noise: int = 16,
    n_samples: int = 9001,
    sampling_rate: float = 100.0,
    seed: int = 0,
    chunk: str = "",
    split_prob=(0.7, 0.1, 0.2),
) -> Path:
    """Write a small labeled dataset; returns the dataset directory."""
    dest_dir = Path(dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    meta_path = dest_dir / f"metadata{chunk}.csv"
    wave_path = dest_dir / f"waveforms{chunk}.hdf5"
    with WaveformDataWriter(meta_path, wave_path) as writer:
        writer.data_format = {
            "dimension_order": "CW",
            "component_order": "ZNE",
            "unit": "counts",
            "instrument_response": "not restituted",
        }
        for i in range(n_events + n_noise):
            is_noise = i >= n_events
            split = rng.choice(["train", "dev", "test"], p=list(split_prob))
            md = {
                "source_id": f"synth{i:05d}",
                "source_type": "noise" if is_noise else ("lp" if rng.random() < 0.4 else "regular"),
                "station_network_code": "AV",
                "station_code": f"S{i % 7:03d}",
                "station_location_code": "",
                "trace_channel": "BH",
                "trace_sampling_rate_hz": sampling_rate,
                "trace_name": f"synth{i:05d}",
                "split": split,
            }
            if is_noise:
                data = (rng.normal(size=(3, n_samples)) * rng.uniform(0.05, 0.5)).astype(
                    np.float32
                )
                md["trace_p_arrival_sample"] = np.nan
                md["trace_s_arrival_sample"] = np.nan
            else:
                p = int(rng.uniform(0.25, 0.55) * n_samples)
                s = p + int(rng.uniform(1.0, 6.0) * sampling_rate)
                data = _event_waveform(rng, n_samples, sampling_rate, p, s, lp=md["source_type"] == "lp")
                md["trace_p_arrival_sample"] = float(p)
                md["trace_s_arrival_sample"] = float(s)
            writer.add_trace(md, data)
    # (re)generate chunk index
    from volpick_tpu.data.assemble import generate_chunk_file

    generate_chunk_file(dest_dir)
    return dest_dir
