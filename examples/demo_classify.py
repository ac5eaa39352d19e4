"""Demo: pick P/S phases on a stream with the published volpick models.

Counterpart of the reference's `Final_models/demo.ipynb`:
    picker = WaveformPicker(*from_pretrained("eqtransformer"))
    output = picker.classify(stream, overlap=5500, blinding=(500, 500))

Run: python examples/demo_classify.py [path/to/file.mseed ...]
Without arguments, a synthetic 2-station stream with known events is used.
"""

import sys

import numpy as np

from volpick_tpu.core import Stream, Trace, UTC
from volpick_tpu.models import from_pretrained
from volpick_tpu.picker import WaveformPicker


def synthetic_stream():
    rng = np.random.default_rng(7)
    traces = []
    for sta, events in (("DEMO1", (60.0, 180.0)), ("DEMO2", (120.0,))):
        n = 30000  # 5 min @ 100 Hz
        t = np.arange(n) / 100.0
        d = rng.normal(size=(3, n)) * 0.05
        for p_at in events:
            env = np.where(t >= p_at, np.exp(-(t - p_at) / 2.0), 0)
            d[0] += np.sin(2 * np.pi * 8 * t) * env * 2
            env_s = np.where(t >= p_at + 3.5, np.exp(-(t - p_at - 3.5) / 3.0), 0)
            d[1] += np.sin(2 * np.pi * 4 * t) * env_s * 3
            d[2] += np.sin(2 * np.pi * 4 * t) * env_s * 2.5
        for i, c in enumerate("ZNE"):
            traces.append(
                Trace(d[i], dict(network="XX", station=sta, channel=f"BH{c}",
                                 sampling_rate=100.0, starttime=UTC("2024-01-01")))
            )
    return Stream(traces)


def main():
    if len(sys.argv) > 1:
        from volpick_tpu.io import read_mseed

        stream = Stream()
        for path in sys.argv[1:]:
            stream += read_mseed(path)
    else:
        print("no input files given; using a synthetic demo stream")
        stream = synthetic_stream()

    for arch, kwargs in (
        ("phasenet", dict(overlap=2500, blinding=(500, 500))),
        ("eqtransformer", dict(overlap=5500, blinding=(500, 500), batch_size=256)),
    ):
        try:
            model, params = from_pretrained(
                arch, search_paths=["/root/reference/Final_models/volpick"]
            )
        except FileNotFoundError:
            print(f"[{arch}] pretrained weights not found, skipping")
            continue
        picker = WaveformPicker(model, params)
        output = picker.classify(stream, **kwargs)
        print(f"\n=== {arch} ===")
        print(output)
        for p in output.picks:
            print(" ", p)
        for d in output.detections[:10]:
            print("  DET", d)


if __name__ == "__main__":
    main()
