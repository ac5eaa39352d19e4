"""Headline benchmark: EQTransformer classify() window throughput on TPU.

Measures the fused device path (condition → forward → window probabilities)
on classify()-shaped batches — the hot loop of continuous picking (BASELINE
config 2: EQT, batch 256, overlap 5500, blinding (500,500)) — and compares
against CPU torch (the reference's runtime) on the same work.

Prints ONE JSON line:
  {"metric": "eqt_classify_windows_per_s", "value": N, "unit": "windows/s",
   "vs_baseline": ratio_vs_cpu_torch}
"""

import json
import os
import sys
import time

import numpy as np


def _tpu_throughput(n_batches: int = 8, batch: int = 256) -> float:
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import EQTransformer, from_pretrained
    from volpick_tpu.ops.signal import detrend_linear, normalize_amplitude

    try:
        model, params = from_pretrained(
            "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
        )
    except Exception:
        model = EQTransformer()
        params = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def forward(params, x):
        x = detrend_linear(x)
        x = normalize_amplitude(x, norm=model.norm, per_channel=True)
        det, p, s = model.apply(params, x)
        return jnp.stack([det, p, s], axis=1)

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.normal(size=(batch, 3, 6000)), dtype=jnp.float32)
        for _ in range(2)
    ]
    # compile + warm up
    forward(params, xs[0]).block_until_ready()
    t0 = time.perf_counter()
    out = None
    for i in range(n_batches):
        out = forward(params, xs[i % 2])
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return n_batches * batch / dt


def _torch_cpu_throughput(n_windows: int = 64, batch: int = 32) -> float:
    """Reference-runtime baseline: torch CPU forward on the same windows."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from torch_oracle import EQTransformerTorch

    tm = EQTransformerTorch()
    pt = "/root/reference/Final_models/volpick/eqtransformer/volpick.pt.v1"
    if os.path.exists(pt):
        tm.load_state_dict(torch.load(pt, map_location="cpu", weights_only=True))
    tm.eval()
    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.normal(size=(batch, 3, 6000)).astype(np.float32))
    with torch.no_grad():
        tm(x)  # warm up
        t0 = time.perf_counter()
        done = 0
        while done < n_windows:
            tm(x)
            done += batch
        dt = time.perf_counter() - t0
    return done / dt


def main():
    tpu = _tpu_throughput()
    try:
        cpu = _torch_cpu_throughput()
    except Exception as e:
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        cpu = float("nan")
    vs = tpu / cpu if cpu == cpu and cpu > 0 else None
    print(
        json.dumps(
            {
                "metric": "eqt_classify_windows_per_s",
                "value": round(tpu, 2),
                "unit": "windows/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
