"""Day-scale multi-station classify on real TPU hardware.

VERDICT round-2 item 6: the segmented classify path
(`picker/annotate.py classify_arrays`, `max_span` segmentation) is
CPU-tested (`tests/test_picker.py`) but the day-scale claim had never touched
silicon. This script pushes 24 h x 16 stations of synthetic 100 Hz data
(~8.64 M samples/station, 1.66 GB float32) through segmented
`classify_arrays` on the TPU and records:

  - wall time + windows/s (end to end, including host->device transfer over
    the axon tunnel, which production on-host TPUs would not pay);
  - peak RSS of the process;
  - number of distinct XLA compiles (all segments share one shape =>
    2 programs: the steady segment shape + the final ragged segment);
  - pick identity vs an unsegmented single pass over the first 2 h subset.

Writes a JSON line to docs/TPU_PROBE.jsonl (stage "dayscale") and a summary
section to docs/STATUS.md is left to the caller.

Usage:
    timeout 3600 python -u scripts/run_dayscale.py [--hours 24] [--stations 16]
"""

import argparse
import json
import resource
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def log(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(REPO / "docs" / "TPU_PROBE.jsonl", "a") as f:
        f.write(line + "\n")


def make_day(stations: int, n_samples: int, seed: int = 0) -> np.ndarray:
    """Synthetic continuous data with a realistic event rate (~12/h/station):
    band-limited noise + damped-oscillator arrivals, built in hour chunks to
    bound the working set."""
    rng = np.random.default_rng(seed)
    out = np.empty((stations, 3, n_samples), dtype=np.float32)
    chunk = 360_000  # one hour at 100 Hz
    t_ev = np.arange(2000, dtype=np.float32)
    for s in range(stations):
        for c0 in range(0, n_samples, chunk):
            c1 = min(c0 + chunk, n_samples)
            noise = rng.normal(0, 1, size=(3, c1 - c0)).astype(np.float32)
            # cheap red-noise shaping: two-pass cumulative smoothing
            noise = np.cumsum(noise, axis=-1)
            noise -= np.linspace(noise[:, 0], noise[:, -1], c1 - c0, axis=-1)
            noise /= max(noise.std(), 1e-6)
            out[s, :, c0:c1] = noise
        n_events = int(rng.poisson(12 * n_samples / 360_000))
        for _ in range(n_events):
            pos = int(rng.integers(0, max(n_samples - 2200, 1)))
            f = rng.uniform(1.5, 12.0)
            amp = rng.uniform(3.0, 12.0)
            wave = (
                np.sin(2 * np.pi * f * t_ev / 100.0)
                * np.exp(-t_ev / rng.uniform(150, 600))
            ).astype(np.float32)
            for c in range(3):
                out[s, c, pos : pos + 2000] += amp * rng.uniform(0.5, 1.0) * wave
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=24.0)
    ap.add_argument("--stations", type=int, default=16)
    ap.add_argument("--subset-hours", type=float, default=2.0)
    args = ap.parse_args()

    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    import jax

    from volpick_tpu.models import from_pretrained
    from volpick_tpu.picker import WaveformPicker

    log({"event": "probe_start", "jax": jax.__version__, "backend": jax.default_backend()})

    n_samples = int(args.hours * 360_000)
    t0 = time.perf_counter()
    data = make_day(args.stations, n_samples)
    t_gen = time.perf_counter() - t0
    print(f"data built: {data.nbytes / 1e9:.2f} GB in {t_gen:.1f}s", flush=True)

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    picker = WaveformPicker(model, params)
    thresholds = {"Detection": 0.10141666, "P": 0.22, "S": 0.22, "N": 2.0}
    window, overlap = model.in_samples, 3000  # reference default 50% overlap

    compiles = [0]
    orig = picker._fused_classify_fn

    def _n_fused():
        return len(picker._jitted.get("fused", {}))

    def counting(*a, **k):
        before = _n_fused()
        fn = orig(*a, **k)
        if _n_fused() != before:
            compiles[0] += 1
        return fn

    picker._fused_classify_fn = counting

    t0 = time.perf_counter()
    res = picker.classify_arrays(data, thresholds, overlap=overlap)
    t_day = time.perf_counter() - t0
    n_picks = {k: int(v[2].sum()) for k, v in res.items()}
    n_win_total = args.stations * max((n_samples - window) // (window - overlap) + 2, 1)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    log({
        "stage": "dayscale",
        "hours": args.hours,
        "stations": args.stations,
        "input_gb": round(data.nbytes / 1e9, 2),
        "wall_s": round(t_day, 1),
        "windows_per_s_end_to_end": round(n_win_total / t_day, 1),
        "n_picks": n_picks,
        "distinct_compiled_programs": compiles[0],
        "peak_rss_gb": round(rss_gb, 2),
    })

    # pick identity: first subset-hours, segmented (tiny max_span) vs one pass
    sub = data[:, :, : int(args.subset_hours * 360_000)]
    res_seg = picker.classify_arrays(sub, thresholds, overlap=overlap, max_span=200_000)
    res_one = picker.classify_arrays(sub, thresholds, overlap=overlap)

    def pickset(r):
        out = {}
        for k, (pk, val, valid, on, off) in r.items():
            rows = []
            for s in range(pk.shape[0]):
                m = valid[s]
                rows.append(set(zip(pk[s][m].tolist(), np.round(val[s][m], 5).tolist())))
            out[k] = rows
        return out

    a, b = pickset(res_seg), pickset(res_one)
    identical = all(a[k][s] == b[k][s] for k in a for s in range(len(a[k])))
    log({
        "stage": "dayscale",
        "event": "segmentation_identity",
        "subset_hours": args.subset_hours,
        "segmented_equals_single_pass": bool(identical),
        "n_picks_subset": {k: sum(len(x) for x in a[k]) for k in a},
    })
    if not identical:
        for k in a:
            for s in range(len(a[k])):
                if a[k][s] != b[k][s]:
                    print(f"DIFF {k} station {s}: seg-only {sorted(a[k][s]-b[k][s])[:5]} "
                          f"one-only {sorted(b[k][s]-a[k][s])[:5]}", flush=True)
    sys.exit(0 if identical else 1)


if __name__ == "__main__":
    main()
