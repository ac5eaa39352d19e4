"""Capture a jax.profiler trace of the fused classify program on the TPU.

VERDICT round-2 item 1 asked for a committed op-level profile of the fused
frame -> condition -> forward -> stack -> trigger program (the previous
"XLA-schedule-bound" conclusion was reached without a trace). This script
runs the bench workload (BASELINE config 2), captures a trace around chained
device iterations, and writes the op-level summary (volpick_tpu.utils.
profiling.summarize_trace) to docs/PROFILE_classify.json.

Usage:
    timeout 1800 python -u scripts/profile_classify.py [--iters 8]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace-dir", default="/tmp/volpick_profile")
    args = ap.parse_args()

    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from volpick_tpu.ops.windows import window_starts
    from volpick_tpu.picker import WaveformPicker
    from volpick_tpu.models import from_pretrained
    from volpick_tpu.utils.profiling import summarize_trace, trace

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    picker = WaveformPicker(model, params)
    rng = np.random.default_rng(0)
    data = bench._make_stream_array(rng)
    total = data.shape[-1]
    starts = window_starts(total, bench.WINDOW, bench.OVERLAP)
    thr = {"P": 0.22, "S": 0.22, "Detection": 0.10141666}
    run = picker._fused_classify_fn(
        bench.STATIONS, len(starts), total, bench.BLINDING, "avg",
        (thr["Detection"], thr["P"], thr["S"]), 64, 256,
        stride=bench.WINDOW - bench.OVERLAP,
    )
    d, st = jnp.asarray(data), jnp.asarray(starts)

    def chained(iters):
        @jax.jit
        def loop(d):
            def body(i, carry):
                res = run(picker.params, d + carry * 1e-30, st)
                return sum(jnp.sum(v[1]) for v in res.values()) * 1e-6 + carry * 0.5

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return loop

    loop = chained(args.iters)
    float(jax.device_get(loop(d)))  # warm/compile outside the trace
    t0 = time.perf_counter()
    with trace(args.trace_dir):
        out = float(jax.device_get(loop(d)))
    wall = time.perf_counter() - t0
    print(f"traced {args.iters} chained iters in {wall:.2f}s (result {out:.3g})", flush=True)

    summary = summarize_trace(args.trace_dir)
    meta = {
        "workload": "fused EQT classify, BASELINE config 2 (8 stations x 20 min, overlap 5500)",
        "iters_in_trace": args.iters,
        "wall_s_incl_tunnel": round(wall, 2),
        "backend": jax.default_backend(),
        "jax": jax.__version__,
    }
    out_path = REPO / "docs" / "PROFILE_classify.json"
    out_path.write_text(json.dumps({"meta": meta, "planes": summary}, indent=1))
    print(f"wrote {out_path}", flush=True)
    for plane, rows in summary.items():
        print(f"== {plane}")
        for r in rows[:15]:
            print(f"  {r['total_ms']:>10.2f} ms  x{r['count']:<6} {r['name'][:90]}")


if __name__ == "__main__":
    main()
