"""Tracing / profiling / debugging helpers (SURVEY §5 auxiliary subsystems).

- `trace(dir)`: context manager around jax.profiler traces (view in
  TensorBoard / Perfetto);
- `StepTimer`: per-step wall-clock accounting written next to metrics.csv
  (the reference only records total running_time.txt, `train.py:209-216`);
- `enable_nan_debugging()`: turns on jax_debug_nans so the first NaN in any
  jitted computation raises with a traceback.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir):
    """Profile a block: `with trace("/tmp/jaxtrace"): step(...)`."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir, top: int = 40) -> Dict:
    """Op-level summary of the newest jax.profiler trace under `log_dir`.

    Reads the Chrome-format `*.trace.json.gz` the profiler writes next to the
    xplane protobuf (so no tensorboard install is needed), groups complete
    ('X') events by process (device/host plane) and name, and returns
    {plane: [{name, total_ms, count, mean_us}, ...]} sorted by total time,
    top-`top` rows per plane. Host Python-frame events (names starting with
    '$') are collapsed into one row so device op rows dominate the report.
    """
    import gzip
    import pathlib
    from collections import defaultdict

    traces = sorted(pathlib.Path(log_dir).rglob("*.trace.json.gz"), key=lambda p: p.stat().st_mtime)
    if not traces:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    data = json.load(gzip.open(traces[-1], "rt"))
    events = data.get("traceEvents", [])
    plane_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            plane_names[e["pid"]] = e.get("args", {}).get("name", str(e["pid"]))
    acc: Dict = defaultdict(lambda: defaultdict(lambda: [0.0, 0]))
    for e in events:
        if e.get("ph") != "X":
            continue
        plane = plane_names.get(e.get("pid"), str(e.get("pid")))
        name = e.get("name", "?")
        if name.startswith("$"):
            name = "(host python frames)"
        slot = acc[plane][name]
        slot[0] += float(e.get("dur", 0.0))  # microseconds
        slot[1] += 1
    out = {}
    for plane, names in acc.items():
        rows = [
            {
                "name": n,
                "total_ms": round(tot / 1000.0, 3),
                "count": cnt,
                "mean_us": round(tot / max(cnt, 1), 1),
            }
            for n, (tot, cnt) in names.items()
        ]
        rows.sort(key=lambda r: -r["total_ms"])
        out[plane] = rows[:top]
    return out


def enable_nan_debugging(enable: bool = True):
    import jax

    jax.config.update("jax_debug_nans", enable)


def device_memory_stats() -> Dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out


class StepTimer:
    """Accumulates per-step durations; summary() gives p50/p90/max and
    steps/s. Write to disk with save()."""

    def __init__(self):
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> Dict:
        import numpy as np

        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        return {
            "steps": len(d),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "max_s": float(d.max()),
            "steps_per_s": float(1.0 / d.mean()),
        }

    def save(self, path):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
