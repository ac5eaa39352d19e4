"""Dataset-compilation workflow example (the reference's data_proc scripts).

End-to-end, obspy-free:
1. parse a region catalog (hypoinverse archive + summary),
2. flatten to the per-station pick table,
3. (with network + obspy: download waveforms per row — scaffolded),
4. convert waveforms to a benchmark dataset chunk (spikes/SNR/FI/splits),
5. assemble chunks and build evaluation targets.

This script demonstrates the flow with synthetic stand-ins for steps the
container cannot perform (no network).
"""

import numpy as np
import pandas as pd

from volpick_tpu.acquisition import read_hypoinverse_catalog
from volpick_tpu.acquisition.convert import convert_catalog_to_dataset
from volpick_tpu.acquisition.download import create_noise_table, filter_failed_downloads
from volpick_tpu.core.stream import Stream, Trace, UTC
from volpick_tpu.data import VCSEIS, generate_chunk_file
from volpick_tpu.eval import generate_task0


def fake_waveform_loader(table: pd.DataFrame, sr=100.0, n=6000):
    rng = np.random.default_rng(0)
    t0_by_name = {
        r["trace_name"]: UTC(r["source_origin_time"]) - 1.0 for _, r in table.iterrows()
    }

    def load(trace_name: str) -> Stream:
        t0 = t0_by_name[trace_name]
        t = np.arange(n) / sr
        d = rng.normal(size=(3, n)) * 0.1
        env = np.where(t >= 8.0, np.exp(-(t - 8.0) / 2.0), 0)
        d[0] += np.sin(2 * np.pi * 8 * t) * env * 2
        return Stream(
            [Trace(d[i], dict(network="AV", station=trace_name.split(".")[0],
                              channel=f"BH{c}", sampling_rate=sr, starttime=t0))
             for i, c in enumerate("ZNE")]
        )

    return load


def main(workdir="/tmp/data_proc_demo"):
    from pathlib import Path

    work = Path(workdir)
    work.mkdir(parents=True, exist_ok=True)

    # In production: cat = read_hypoinverse_catalog("archive.arc", "summary.txt")
    # then table = cat.to_dataframe(). Here: a minimal synthetic table.
    rows = []
    for i in range(6):
        t0 = UTC("2020-01-02T03:04:00") + i * 7200.0  # events 2 h apart
        rows.append(
            {
                "source_id": f"ev{i}",
                "source_origin_time": (t0 + 1).isoformat(),
                "source_latitude_deg": 61.2,
                "source_longitude_deg": -152.1,
                "source_depth_km": 3.0,
                "source_magnitude": 1.2,
                "source_magnitude_type": "ml",
                "source_type": "lp" if i % 2 else "vt",
                "station_network_code": "AV",
                "station_code": f"ST{i % 3}",
                "station_location_code": "",
                "trace_channel": "BH",
                "trace_p_arrival_time": (t0 + 8.0).isoformat(),
                "trace_s_arrival_time": (t0 + 11.0).isoformat(),
                "trace_name": f"ST{i % 3}.ev{i}",
            }
        )
    table = pd.DataFrame(rows)

    # noise windows for a noise dataset (quiet inter-event gaps)
    noise = create_noise_table(table, time_difference_limit=60.0)
    print(f"noise-window candidates: {len(noise)}")

    # waveforms → benchmark dataset chunk
    convert_catalog_to_dataset(table, fake_waveform_loader(table), work / "dataset",
                               chunk="_demo", seed=42)
    generate_chunk_file(work / "dataset")
    ds = VCSEIS(work / "dataset")
    print(f"dataset: {len(ds)} traces; LP={len(ds.get_long_period_earthquakes())}")

    generate_task0(ds, work / "targets")
    print("targets written to", work / "targets")


if __name__ == "__main__":
    main()
