"""On-TPU probe: Pallas kernel compile/benchmark + bf16/forward axes.

Measures, on the real (axon-tunneled) TPU chip, with tunnel overhead factored
out via chained fori_loop iterations and a scalar fetch (block_until_ready
does not wait over the tunnel):

  stage 1 (default):  condition_windows_pallas vs the jnp conditioning
  stage 2 (--rescnn): bounded attempt to Mosaic-compile res_cnn_stack_pallas
  stage 3 (--axes):   fused classify fp32 vs bf16, pure forward fp32/bf16

Writes results as JSON lines to stdout and appends to docs/TPU_PROBE.json.
Run stages in separate processes (one tunnel client at a time; a hung Mosaic
compile must not take the other stages down):

    timeout 1800 python -u scripts/tpu_probe.py
    timeout 1800 python -u scripts/tpu_probe.py --rescnn
    timeout 2400 python -u scripts/tpu_probe.py --axes
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def log(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    out = Path(__file__).resolve().parents[1] / "docs" / "TPU_PROBE.jsonl"
    with open(out, "a") as f:
        f.write(line + "\n")


def bench_loop(op, x, iters_a=100, iters_b=1100):
    """Per-iteration seconds for y=op(x), tunnel overhead excluded.

    Chains iterations through a scalar carry (fori_loop) so XLA cannot
    collapse them, runs two different iteration counts, and divides the
    wall-clock difference — constant per-call overhead (dispatch, tunnel
    RTT, fetch) cancels."""
    import jax
    import jax.numpy as jnp

    def make(iters):
        @jax.jit
        def loop(x):
            def body(i, carry):
                y = op(x + carry * 1e-30)
                return jnp.mean(y) * 1e-6 + carry * 0.5

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return loop

    la, lb = make(iters_a), make(iters_b)
    xd = jax.device_put(x)
    # warm both executables (compile + cache)
    float(jax.device_get(la(xd)))
    float(jax.device_get(lb(xd)))

    def run(l):
        t0 = time.perf_counter()
        r = float(jax.device_get(l(xd)))
        return time.perf_counter() - t0, r

    ta = min(run(la)[0] for _ in range(3))
    tb = min(run(lb)[0] for _ in range(3))
    return max(tb - ta, 1e-9) / (iters_b - iters_a)


def stage_conditioning():
    import jax
    import jax.numpy as jnp

    from volpick_tpu.ops.pallas.conditioning import condition_windows_pallas
    from volpick_tpu.ops.signal import demean, detrend_linear, normalize_amplitude

    dev = jax.devices()[0]
    log({"stage": "conditioning", "device": str(dev), "platform": dev.platform})

    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 3, 6000)).astype(np.float32)

    def jnp_cond(v):
        return normalize_amplitude(detrend_linear(v), norm="peak", per_channel=True)

    def pallas_cond(v):
        return condition_windows_pallas(v, detrend=True, norm="peak")

    # correctness on-device first
    try:
        t0 = time.perf_counter()
        got = np.asarray(jax.device_get(jax.jit(pallas_cond)(jnp.asarray(x))))
        compile_s = time.perf_counter() - t0
        want = np.asarray(jax.device_get(jax.jit(jnp_cond)(jnp.asarray(x))))
        err = float(np.max(np.abs(got - want)))
        log({"stage": "conditioning", "event": "pallas_compiled_on_tpu",
             "first_call_s": round(compile_s, 2), "max_abs_err_vs_jnp": err})
        if err > 1e-4:
            log({"stage": "conditioning", "event": "MISMATCH", "err": err})
            return
    except Exception as e:  # capture the failure artifact verbatim
        log({"stage": "conditioning", "event": "pallas_compile_FAILED",
             "error": f"{type(e).__name__}: {e}"[:2000]})
        return

    t_jnp = bench_loop(jnp_cond, x)
    n_bytes = x.nbytes
    for tile in (8, 32, 64, 128):
        t_pal = bench_loop(
            lambda v, tile=tile: condition_windows_pallas(
                v, detrend=True, norm="peak", tile=tile
            ),
            x,
        )
        log({
            "stage": "conditioning",
            "tile": tile,
            "jnp_s_per_call": round(t_jnp * 1e6) / 1e6,
            "pallas_s_per_call": round(t_pal * 1e6) / 1e6,
            "speedup": round(t_jnp / t_pal, 3),
            "jnp_GBps_rw": round(2 * n_bytes / t_jnp / 1e9, 1),
            "pallas_GBps_rw": round(2 * n_bytes / t_pal / 1e9, 1),
        })


def stage_rescnn():
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained
    from volpick_tpu.ops.pallas.rescnn import fold_res_cnn_params, res_cnn_stack_pallas

    log({"stage": "rescnn", "event": "start",
         "note": "bounded Mosaic compile attempt of the 42-matmul body"})
    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    packed = fold_res_cnn_params(params["res_cnn"])
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 64, 47)).astype(np.float32)

    try:
        t0 = time.perf_counter()
        out = np.asarray(jax.device_get(res_cnn_stack_pallas(jnp.asarray(x), packed)))
        compile_s = time.perf_counter() - t0
        log({"stage": "rescnn", "event": "pallas_compiled_on_tpu",
             "first_call_s": round(compile_s, 2), "out_norm": float(np.abs(out).mean())})
    except Exception as e:
        log({"stage": "rescnn", "event": "pallas_compile_FAILED",
             "error": f"{type(e).__name__}: {e}"[:2000]})
        return

    # reference section: the model's own res-CNN via XLA (same math as the
    # trunk's pre-activation loop, eqtransformer.py apply())
    from volpick_tpu.models.layers import batch_norm, conv1d_same

    def xla_op(v):
        h = v
        for block in params["res_cnn"]:
            y = jax.nn.relu(batch_norm(h, block["norm1"], train=False, eps=1e-3)[0])
            y = conv1d_same(y, block["conv1"]["w"], block["conv1"]["b"])
            y = jax.nn.relu(batch_norm(y, block["norm2"], train=False, eps=1e-3)[0])
            y = conv1d_same(y, block["conv2"]["w"], block["conv2"]["b"])
            h = h + y
        return h

    def pal_op(v):
        return res_cnn_stack_pallas(v, packed)

    want = np.asarray(jax.device_get(jax.jit(xla_op)(jnp.asarray(x))))
    err = float(np.max(np.abs(out - want)))
    t_xla = bench_loop(xla_op, x)
    t_pal = bench_loop(pal_op, x)
    log({
        "stage": "rescnn",
        "max_abs_err_vs_xla": err,
        "xla_s_per_call": round(t_xla * 1e6) / 1e6,
        "pallas_s_per_call": round(t_pal * 1e6) / 1e6,
        "speedup": round(t_xla / t_pal, 3),
    })


def stage_axes():
    """fp32 vs bf16 fused classify + pure forward throughput axes."""
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained
    from volpick_tpu.ops.windows import window_starts
    from volpick_tpu.picker import WaveformPicker

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    WINDOW, OVERLAP, BLINDING = 6000, 5500, (500, 500)
    rng = np.random.default_rng(0)
    n = int(20 * 60 * 100)
    data = rng.normal(size=(8, 3, n)).astype(np.float32) * 0.1
    total = data.shape[-1]
    starts = window_starts(total, WINDOW, OVERLAP)
    n_win = len(starts)
    thr = (0.10141666, 0.22, 0.22)

    results = {}
    for precision in ("float32", "bfloat16"):
        picker = WaveformPicker(model, params, precision=precision)
        run = picker._fused_classify_fn(
            8, n_win, total, BLINDING, "avg", thr, 64, 256, stride=WINDOW - OVERLAP
        )
        d, st = jnp.asarray(data), jnp.asarray(starts)
        _ = jax.device_get(run(picker.params, d, st))  # compile+warm
        t0 = time.perf_counter()
        handles = [run(picker.params, d, st) for _ in range(12)]
        _ = [jax.device_get(h) for h in handles]
        dt = time.perf_counter() - t0
        results[f"classify_{precision}_windows_per_s"] = round(8 * n_win * 12 / dt, 1)

    # pure device forward (no framing/stacking/triggering, no tunnel in loop).
    # MUST consume every output head: round 3 sliced `[:, 0]` (detection
    # only), which let XLA dead-code-eliminate the P and S decoder branches
    # and report 330k windows/s — 2.59e8 FLOPs/window x 330k = 85 TFLOP/s,
    # over the v5e fp32 MXU peak, i.e. physically impossible for the full
    # model. The honest full-output forward is ~100k windows/s, so the fused
    # one-scan classify (~110k) is AT the forward bound (r4 scan_breakdown).
    frames = rng.normal(size=(256, 3, WINDOW)).astype(np.float32)
    for precision in ("float32", "bfloat16"):
        picker = WaveformPicker(model, params, precision=precision)

        def fwd(v):
            return picker._apply_model(picker.params, v)  # (N, K, W), all heads

        t = bench_loop(fwd, frames, iters_a=10, iters_b=110)
        results[f"forward_{precision}_windows_per_s"] = round(256 / t, 1)
    results["stage"] = "axes"
    log(results)


def stage_breakdown():
    """Time the fused classify program stage by stage on the bench workload
    to find where the gap between pure forward (~330k w/s) and fused
    classify (~39k w/s) lives."""
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained
    from volpick_tpu.ops.signal import detrend_linear, normalize_amplitude
    from volpick_tpu.ops.triggers import extract_triggers_batched
    from volpick_tpu.ops.windows import frame_windows_uniform, overlap_stack_uniform

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    S, WINDOW, STRIDE, TOTAL, CHUNK = 8, 6000, 500, 120000, 256
    N = (TOTAL - WINDOW) // STRIDE + 1  # 229 uniform windows
    rng = np.random.default_rng(0)
    data = rng.normal(size=(S, 3, TOTAL)).astype(np.float32)

    def build(mode):
        def run(params, d):
            frames = frame_windows_uniform(d, N, STRIDE, WINDOW)
            frames = jnp.moveaxis(frames, 0, 1).reshape(S * N, 3, WINDOW)
            nf = S * N
            pad = (-nf) % CHUNK
            frames = jnp.pad(frames, ((0, pad), (0, 0), (0, 0))).reshape(-1, CHUNK, 3, WINDOW)

            def cond(fr):
                fr = detrend_linear(fr)
                return normalize_amplitude(fr, norm="peak", per_channel=True)

            if mode == "condition":
                out = jax.lax.map(cond, frames)
                return jnp.sum(out[..., ::997])

            def fwd(fr):
                det, p, s = model.apply(params, cond(fr))
                return jnp.stack([det, p, s], axis=1)

            preds = jax.lax.map(fwd, frames)
            preds = preds.reshape(-1, 3, WINDOW)[:nf].reshape(S, N, 3, WINDOW)
            if mode == "forward":
                return jnp.sum(preds[..., ::997])
            curves = jax.vmap(
                lambda q: overlap_stack_uniform(q, STRIDE, blinding=(500, 500))
            )(preds)[..., :TOTAL]
            if mode == "stack":
                return jnp.sum(curves[..., ::997])
            flat = jnp.concatenate([curves[:, k] for k in range(3)], axis=0)
            thr_rows = jnp.concatenate(
                [jnp.full((S,), t, jnp.float32) for t in (0.10141666, 0.22, 0.22)]
            )
            return {"all": extract_triggers_batched(flat, thr_rows, max_picks=64)}

        return jax.jit(run)

    # chain iterations on device (fori_loop + scalar carry) so the tunnel
    # RTT of fetching results does not masquerade as compute time — the
    # async-dispatch wall-clock method under-reports by up to ~75 ms/iter
    # of sequential device_get round trips
    results = {"stage": "breakdown", "n_windows_per_iter": S * N}
    for mode in ("condition", "forward", "stack", "full"):
        run = build(mode)

        def op(d, run=run):
            out = run(params, d)
            if isinstance(out, dict):  # full mode: reduce pick buffers
                return jnp.stack(
                    [jnp.sum(v[0].astype(jnp.float32)) for v in out.values()]
                )
            return out

        t = bench_loop(op, data, iters_a=5, iters_b=55)
        results[f"{mode}_ms_per_iter"] = round(t * 1000, 2)
        results[f"{mode}_windows_per_s"] = round(S * N / t, 1)
    log(results)


def stage_chunks():
    """Sweep the lax.map forward chunk size of the full fused classify."""
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained
    from volpick_tpu.ops.windows import window_starts
    from volpick_tpu.picker import WaveformPicker

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    S, WINDOW, OVERLAP = 8, 6000, 5500
    rng = np.random.default_rng(0)
    data = rng.normal(size=(S, 3, 120000)).astype(np.float32)
    total = data.shape[-1]
    starts = window_starts(total, WINDOW, OVERLAP)
    n_win = len(starts)
    picker = WaveformPicker(model, params)
    d = jnp.asarray(data)
    st = jnp.asarray(starts)
    for chunk in (512, 1832):  # 256 is the measured default baseline
        run = picker._fused_classify_fn(
            S, n_win, total, (500, 500), "avg",
            (0.10141666, 0.22, 0.22), 64, chunk, stride=WINDOW - OVERLAP,
        )

        def op(x, run=run):
            res = run(picker.params, x, st)
            return jnp.stack([jnp.sum(v[1]) for v in res.values()])

        try:
            t = bench_loop(op, data, iters_a=4, iters_b=24)
            log({"stage": "chunks", "chunk": chunk, "n_windows": S * n_win,
                 "windows_per_s": round(S * n_win / t, 1)})
        except Exception as e:
            log({"stage": "chunks", "chunk": chunk,
                 "error": f"{type(e).__name__}: {e}"[:200]})


def stage_trigger():
    """Benchmark the trigger-extraction scan methods on the classify workload.

    Workload = the fused classify trigger stage: 24 rows (8 stations x 3
    channels) x 120k samples, realistic smooth probability curves. Times
    (a) the full extract (scan + top_k compaction + gathers) per method,
    (b) the scan alone, (c) the compaction alone.
    """
    import jax
    import jax.numpy as jnp

    from volpick_tpu.ops.triggers import _scan_states, extract_triggers_batched

    B, W = 24, 120000
    rng = np.random.default_rng(0)
    # smooth prob-like curves with a few events per row
    t = np.arange(W)
    probs = np.abs(rng.normal(0, 0.02, size=(B, W))).astype(np.float32)
    for i in range(B):
        for _ in range(8):
            c = rng.integers(0, W)
            s = rng.uniform(20, 80)
            probs[i] += rng.uniform(0.2, 0.95) * np.exp(-0.5 * ((t - c) / s) ** 2)
    probs = np.clip(probs, 0, 1)
    thr = np.full((B,), 0.22, np.float32)

    # correctness cross-check on device first
    base = None
    for method in ("assoc", "shift", "blocked", "pallas", "pallas_full"):
        try:
            res = [
                np.asarray(a)
                for a in extract_triggers_batched(
                    jnp.asarray(probs), jnp.asarray(thr), max_picks=64, method=method
                )
            ]
            if base is None:
                base = res
                n_picks = int(res[2].sum())
            ok = all(np.array_equal(a, b) for a, b in zip(base, res))
            log({"stage": "trigger", "method": method, "event": "correctness",
                 "matches_assoc": bool(ok), "n_picks": n_picks})
        except Exception as e:
            log({"stage": "trigger", "method": method, "event": "FAILED",
                 "error": f"{type(e).__name__}: {e}"[:1000]})

    for method in ("assoc", "shift", "blocked", "pallas", "pallas_full"):
        def full(p, method=method):
            res = extract_triggers_batched(p, jnp.asarray(thr), max_picks=64, method=method)
            return res[1]  # (B, 64) peak values

        def scan_only(p, method=method):
            _, on, m, am, _ = _scan_states(p, jnp.asarray(thr), jnp.asarray(thr) / 2, method)
            return jnp.sum(m[..., ::997]) + jnp.sum(am[..., ::997]) + jnp.sum(on[..., ::997])

        try:
            t_full = bench_loop(full, probs, iters_a=10, iters_b=110)
            # pallas_full fuses emission into the scan kernel; there is no
            # separate scan/compaction split to time
            t_scan = (
                t_full if method == "pallas_full"
                else bench_loop(scan_only, probs, iters_a=10, iters_b=110)
            )
            log({"stage": "trigger", "method": method,
                 "full_ms": round(t_full * 1000, 3),
                 "scan_ms": round(t_scan * 1000, 3),
                 "compaction_ms_approx": round((t_full - t_scan) * 1000, 3)})
        except Exception as e:
            log({"stage": "trigger", "method": method, "event": "BENCH_FAILED",
                 "error": f"{type(e).__name__}: {e}"[:500]})


def stage_classify_methods():
    """End-to-end fused classify throughput per trigger method."""
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained
    from volpick_tpu.ops.windows import window_starts
    from volpick_tpu.picker import WaveformPicker

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    S, WINDOW, OVERLAP = 8, 6000, 5500
    rng = np.random.default_rng(0)
    data = rng.normal(size=(S, 3, 120000)).astype(np.float32)
    total = data.shape[-1]
    starts = window_starts(total, WINDOW, OVERLAP)
    n_win = len(starts)
    st = jnp.asarray(starts)
    import os as _os

    for method in ("assoc", "blocked", "pallas", "shift", "pallas_full"):
        _os.environ["VOLPICK_TRIGGER_METHOD"] = method
        picker = WaveformPicker(model, params)
        run = picker._fused_classify_fn(
            S, n_win, total, (500, 500), "avg",
            (0.10141666, 0.22, 0.22), 64, 256, stride=WINDOW - OVERLAP,
        )

        def op(x, run=run):
            res = run(picker.params, x, st)
            return jnp.stack([jnp.sum(v[1]) for v in res.values()])

        try:
            t = bench_loop(op, data, iters_a=4, iters_b=24)
            log({"stage": "classify_methods", "method": method,
                 "ms_per_iter": round(t * 1000, 2),
                 "windows_per_s": round(S * n_win / t, 1)})
        except Exception as e:
            log({"stage": "classify_methods", "method": method,
                 "error": f"{type(e).__name__}: {e}"[:500]})
    _os.environ.pop("VOLPICK_TRIGGER_METHOD", None)


def stage_annotate():
    """annotate_array throughput on the bench workload (BASELINE config 3:
    continuous multi-station probability curves). Since round 3 annotate
    rides the same one-scan program family as classify (curves body without
    trigger extraction) — this records its windows/s beside classify's so
    the unified-path claim has a number (VERDICT round-2 item 5 tail)."""
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained
    from volpick_tpu.ops.windows import window_starts
    from volpick_tpu.picker import WaveformPicker

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    picker = WaveformPicker(model, params)
    S, WINDOW, OVERLAP = 8, 6000, 5500
    rng = np.random.default_rng(0)
    data = rng.normal(size=(S, 3, 120000)).astype(np.float32)
    total = data.shape[-1]
    starts = window_starts(total, WINDOW, OVERLAP)
    n_win = len(starts)
    st = jnp.asarray(starts)
    run = picker._fused_annotate_fn(
        S, n_win, total, (500, 500), "avg", 256, stride=WINDOW - OVERLAP
    )

    def op(x):
        curves = run(picker.params, x, st)  # (S, K, total)
        return jnp.sum(curves, axis=(0, 2))

    t = bench_loop(op, data, iters_a=4, iters_b=24)
    log({"stage": "annotate", "model": "eqtransformer", "stations": S,
         "window": WINDOW, "overlap": OVERLAP,
         "ms_per_iter": round(t * 1000, 2),
         "annotate_windows_per_s": round(S * n_win / t, 1)})


def stage_classify_archs():
    """Per-architecture fused classify throughput (VERDICT round-2 item 4:
    TPUPickNet head-to-head needs a classify windows/s axis beside EQT's).

    Throughput is weight-independent, so PhaseNet/EQTransformer use the
    imported volpick weights and TPUPickNet its initializer — the workload
    (8 stations x 20 min, stride 500) and methodology (chained fori_loop,
    differenced) match run_training_study.classify_throughput exactly."""
    import jax

    from run_training_study import classify_throughput
    from volpick_tpu.models import TPUPickNet, from_pretrained

    configs = []
    for name in ("phasenet", "eqtransformer"):
        model, params = from_pretrained(
            name, search_paths=["/root/reference/Final_models/volpick"]
        )
        configs.append((name, model, params))
    tp = TPUPickNet()
    configs.append(("tpupicknet", tp, tp.init(jax.random.PRNGKey(0))))

    for name, model, params in configs:
        # bf16 axis only where the forward is matmul-bound (TPUPickNet):
        # PhaseNet/EQT measured bf16≈fp32 in stage_axes (VPU/LSTM-bound).
        precisions = ("float32", "bfloat16") if name == "tpupicknet" else ("float32",)
        for precision in precisions:
            try:
                wps = classify_throughput(
                    model, params, model.in_samples - 500, precision=precision
                )
                log({"stage": "classify_archs", "model": name,
                     "window": model.in_samples, "stride": 500,
                     "precision": precision,
                     "classify_windows_per_s": round(wps, 1)})
            except Exception as e:
                log({"stage": "classify_archs", "model": name,
                     "precision": precision,
                     "error": f"{type(e).__name__}: {e}"[:500]})


def stage_train():
    """Training-step throughput on the real chip: batch 512, the FULL
    on-device augmentation program (window/label/stack/gap) + forward +
    backward + Adam + BN-stats merge + EMA, chained on device. Reports
    samples/s/chip per architecture — the number behind the
    zero-loader-worker design claim (VERDICT round-2 item 3b) and the
    TPUPickNet MXU-first training claim."""
    import gc

    from volpick_tpu.models import EQTransformer, PhaseNet, TPUPickNet

    for cls in (EQTransformer, PhaseNet, TPUPickNet):
        try:
            _train_one_model(cls)
        except Exception as e:
            log({"stage": "train", "model": cls.__name__, "event": "FAILED",
                 "error": f"{type(e).__name__}: {e}"[:500]})
        gc.collect()


def _train_one_model(model_cls):
    import jax
    import jax.numpy as jnp

    from volpick_tpu.pipeline.augmentations import augment_train_batch
    from volpick_tpu.train.ema import ema_update
    from volpick_tpu.train.trainer import Trainer, make_augment_config, merge_bn_updates

    B = 512
    model = model_cls()
    params = model.init(jax.random.PRNGKey(0))
    trainer = Trainer(model, params, ema=True, lr=1e-3)
    cfg = make_augment_config(model, {}, stack=True)

    rng = np.random.default_rng(0)
    wraw = cfg.pre_window

    def make_raw(has_onsets=True):
        x = rng.normal(size=(B, 3, wraw)).astype(np.float32)
        lens = np.full((B,), wraw, np.int32)
        if has_onsets:
            p = rng.uniform(2000, wraw - 3000, B).astype(np.float32)
            s = p + rng.uniform(100, 800, B).astype(np.float32)
        else:
            p = np.full((B,), np.nan, np.float32)
            s = np.full((B,), np.nan, np.float32)
        return {"x": jnp.asarray(x), "len": jnp.asarray(lens),
                "p": jnp.asarray(p), "s": jnp.asarray(s)}

    prim, sec, sec2 = make_raw(), make_raw(), make_raw()
    noi, noi2 = make_raw(False), make_raw(False)
    lr = jnp.float32(1e-3)

    def make_loop(iters):
        # every batch rides in as an argument — closing over them would embed
        # ~370 MB of literal constants in the HLO, which the axon remote-compile
        # endpoint rejects (HTTP 413)
        @jax.jit
        def loop(prim_l, sec, sec2, noi, noi2, init):
            def body(i, carry):
                params, opt_state, ema_params, key, acc = carry
                key, k_aug, k_drop = jax.random.split(key, 3)
                batch = augment_train_batch(k_aug, prim_l, sec, sec2, noi, noi2, cfg)
                (loss, bn_up), grads = jax.value_and_grad(
                    lambda p: trainer._loss(p, batch, train=True, rng=k_drop),
                    has_aux=True,
                )(params)
                updates, opt_state = trainer.tx.update(grads, opt_state, params)
                params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
                params = merge_bn_updates(params, bn_up)
                ema_params = ema_update(ema_params, params, 0.999)
                return params, opt_state, ema_params, key, acc + loss

            out = jax.lax.fori_loop(0, iters, body, init)
            return out[-1]

        return loop

    la, lb = make_loop(3), make_loop(13)
    init = (trainer.params, trainer.opt_state, trainer.ema_params,
            jax.random.PRNGKey(7), jnp.float32(0.0))
    args_d = jax.device_put((prim, sec, sec2, noi, noi2, init))
    float(jax.device_get(la(*args_d)))
    float(jax.device_get(lb(*args_d)))

    def run(l):
        t0 = time.perf_counter()
        _ = float(jax.device_get(l(*args_d)))
        return time.perf_counter() - t0

    ta = min(run(la) for _ in range(3))
    tb = min(run(lb) for _ in range(3))
    per_step = max(tb - ta, 1e-9) / 10
    log({"stage": "train", "model": model.name, "batch": B,
         "augment": "full stack program on device", "ema": True,
         "s_per_step": round(per_step, 4),
         "samples_per_s_per_chip": round(B / per_step, 1)})


def stage_classify_chunks(arch: str = "eqtransformer", precision: str = "float32"):
    """Chunk-size sweep for the fused classify: the one-scan program runs
    ceil(n_win/wpc) sequential steps, each a (chunk)-window forward, so a
    bigger chunk amortizes the sequential scan latency until VMEM/HBM
    pressure (or padding waste on the last step) pushes back. Measured r4
    verdict for EQT on the v5e: chunk 256 is the optimum (109.1k windows/s)
    and 512/1024/2048 are strictly worse (98.7/67.5/66.8k) — scan latency
    is NOT the limiter. `--arch phasenet|tpupicknet` sweeps the others."""
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained, load_model
    from volpick_tpu.ops.windows import window_starts
    from volpick_tpu.picker import WaveformPicker

    if arch in ("phasenet", "eqtransformer"):
        model, params = from_pretrained(
            arch, search_paths=["/root/reference/Final_models/volpick"]
        )
    else:  # tpupicknet has no published weights; random init rates the same
        model, params = load_model(arch)
    window = model.in_samples
    rng = np.random.default_rng(0)
    data = rng.normal(size=(8, 3, 120000)).astype(np.float32)
    total = data.shape[-1]
    starts = window_starts(total, window, window - 500)
    picker = WaveformPicker(model, params, precision=precision)
    thr = tuple(0.3 for _ in picker._prob_channels())
    d, st = jnp.asarray(data), jnp.asarray(starts)

    # tpupicknet's (B,H,T,T) score tensor makes big chunks HBM-hostile on
    # the XLA attention path; sweep smaller chunks for it
    chunks = (64, 128, 256, 512) if arch == "tpupicknet" else (128, 256, 512, 1024)
    for chunk in chunks:
        run = picker._fused_classify_fn(
            8, len(starts), total, (0, 0), "avg", thr, 64, chunk,
            stride=500,
            flush_start=int(starts[-1]) if int(starts[-1]) != (len(starts) - 1) * 500 else None,
        )

        def make_loop(iters):
            @jax.jit
            def loop(d):
                def body(i, carry):
                    res = run(picker.params, d + carry * 1e-30, st)
                    return sum(jnp.sum(v[1]) for v in res.values()) * 1e-6 + carry * 0.5

                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

            return loop

        la, lb = make_loop(4), make_loop(24)
        float(jax.device_get(la(d)))
        float(jax.device_get(lb(d)))

        def t(loop):
            t0 = time.perf_counter()
            _ = float(jax.device_get(loop(d)))
            return time.perf_counter() - t0

        ta = min(t(la) for _ in range(2))
        tb = min(t(lb) for _ in range(2))
        per_iter = max(tb - ta, 1e-9) / 20
        log({"stage": "classify_chunks", "model": arch,
             "attn": getattr(model, "attn", None),  # resolved, not the env default
             "precision": precision,
             "chunk": chunk, "n_windows_per_iter": 8 * len(starts),
             "ms_per_iter": round(per_iter * 1000, 2),
             "windows_per_s": round(8 * len(starts) / per_iter, 1)})


def stage_train_e2e():
    """END-TO-END training wall time over the axon tunnel: device-resident
    trace pools (TrainGenerator device_data=True — pools uploaded once,
    per-step traffic is index vectors) vs host-shipped window crops
    (device_data=False — ~5×(B,3,W) float32 per step, the r3 design).
    Unlike stage_train (batches pre-uploaded, chained fori_loop) this
    includes the real per-step host->device path the trainer runs, so the
    gap between the two modes IS the tunnel/upload cost."""
    import gc

    import jax

    from volpick_tpu.data.dataset import load_dataset
    from volpick_tpu.models import EQTransformer
    from volpick_tpu.pipeline.generator import TrainGenerator, _onset_arrays
    from volpick_tpu.train.trainer import Trainer, make_augment_config

    data_dir = "/tmp/volpick_hard_benchmark"
    dataset = load_dataset(data_dir)
    dataset.preload_waveforms()
    train_ds = dataset.get_split("train")
    p, s = _onset_arrays(train_ds.metadata)
    eq = train_ds.filter(~np.isnan(p) | ~np.isnan(s), inplace=False)
    noise = train_ds.filter(np.isnan(p) & np.isnan(s), inplace=False)

    B = 256
    model = EQTransformer()
    cfg = make_augment_config(model, {}, stack=True)

    for device_data in (False, True):
        params = model.init(jax.random.PRNGKey(0))
        trainer = Trainer(model, params, ema=True, lr=1e-3)
        trainer._build_steps()
        gen = TrainGenerator(
            train_ds, cfg, B, eq_dataset=eq, noise_dataset=noise, seed=5,
            device_data=device_data,
        )
        assert gen.device_data == device_data
        import jax.numpy as jnp

        pstate = (trainer.params, trainer.opt_state, trainer.ema_params)
        key = jax.random.PRNGKey(1)
        n_warm, n_meas = 4, 16
        times = []
        cyc = _epoch_cycle(gen)  # lazy: per-step host assembly stays inside the timed loop
        for i in range(n_warm + n_meas):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            batch = next(cyc)
            batch = jax.device_put(batch, trainer.batch_sharding)
            out = trainer._train_step(*pstate, batch, jnp.float32(1e-3), sub)
            pstate, loss = out[:3], out[3]
            float(jax.device_get(loss))  # force completion through the tunnel
            if i >= n_warm:
                times.append(time.perf_counter() - t0)
        per_step = float(np.median(times))
        log({"stage": "train_e2e", "model": model.name, "batch": B,
             "device_data": device_data, "s_per_step": round(per_step, 4),
             "samples_per_s_per_chip": round(B / per_step, 1),
             "note": "per-step wall incl host assembly + upload + step + scalar fetch"})
        del trainer, gen, pstate
        gc.collect()


def _epoch_cycle(gen):
    while True:
        for b in gen.epoch():
            yield b


def stage_profile():
    """Capture a jax.profiler trace of the fused classify program and commit
    an op-level summary (VERDICT round-2 item 1)."""
    import glob
    import gzip

    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained
    from volpick_tpu.ops.windows import window_starts
    from volpick_tpu.picker import WaveformPicker

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    S, WINDOW, OVERLAP = 8, 6000, 5500
    rng = np.random.default_rng(0)
    data = rng.normal(size=(S, 3, 120000)).astype(np.float32)
    total = data.shape[-1]
    starts = window_starts(total, WINDOW, OVERLAP)
    picker = WaveformPicker(model, params)
    run = picker._fused_classify_fn(
        S, len(starts), total, (500, 500), "avg",
        (0.10141666, 0.22, 0.22), 64, 256, stride=WINDOW - OVERLAP,
    )
    d, st = jnp.asarray(data), jnp.asarray(starts)
    out = run(picker.params, d, st)  # compile + warm
    _ = jax.device_get(out)
    logdir = "/tmp/volpick_profile"
    with jax.profiler.trace(logdir):
        handles = [run(picker.params, d, st) for _ in range(8)]
        _ = [jax.device_get(h) for h in handles]
    files = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    log({"stage": "profile", "event": "trace_captured", "files": files[-1:] if files else []})
    try:
        import json as _json

        from volpick_tpu.utils.profiling import summarize_trace

        summary = summarize_trace(logdir)
        out_path = Path(__file__).resolve().parents[1] / "docs" / "PROFILE_classify.json"
        meta = {"workload": "fused EQT classify, 8 stations x 20 min, overlap 5500, 8 iterations",
                "backend": jax.default_backend(), "jax": jax.__version__}
        out_path.write_text(_json.dumps({"meta": meta, "planes": summary}, indent=1))
        log({"stage": "profile", "event": "op_stats_written", "path": str(out_path),
             "planes": list(summary.keys())})
        for plane, rows in summary.items():
            for r in rows[:10]:
                log({"stage": "profile", "plane": plane, **r})
    except Exception as e:
        log({"stage": "profile", "event": "op_stats_FAILED",
             "error": f"{type(e).__name__}: {e}"[:1000]})


def stage_scan_breakdown():
    """Decompose the ONE-SCAN fused classify (the production default since
    round 3) stage by stage on the bench workload (8 stations x 120 k
    samples, stride 500, chunk 256): scan skeleton + framing, + conditioning,
    + forward, + local stack/accumulate, and the full program including
    trigger extraction (`WaveformPicker._fused_classify_fn`). Each variant
    keeps the identical scan structure so the differences isolate each
    stage's marginal cost inside the production program (VERDICT r3 item 4:
    fused 110 k vs pure forward 330 k windows/s — where do 2/3 go?)."""
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained
    from volpick_tpu.ops.signal import detrend_linear, normalize_amplitude
    from volpick_tpu.ops.windows import frame_windows_uniform, overlap_stack_uniform
    from volpick_tpu.picker import WaveformPicker

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    S, C, WINDOW, STRIDE, TOTAL, CHUNK = 8, 3, 6000, 500, 120000, 256
    N = (TOTAL - WINDOW) // STRIDE + 1  # 229
    m = -(-WINDOW // STRIDE)
    wpc = max(1, CHUNK // S)
    n_steps = -(-N // wpc)
    span = (wpc - 1) * STRIDE + WINDOW
    need = (n_steps - 1) * wpc * STRIDE + span
    local_len = (wpc + m - 1) * STRIDE
    acc_len = max((n_steps * wpc + m - 1) * STRIDE, TOTAL)
    rng = np.random.default_rng(0)
    data = rng.normal(size=(S, C, TOTAL)).astype(np.float32)

    def cond(fr):
        return normalize_amplitude(detrend_linear(fr), norm="peak", per_channel=True)

    def fwd(fr):
        det, p, s = model.apply(params, fr)
        return jnp.stack([det, p, s], axis=1)

    def build(mode):
        def run(d):
            datap = (jnp.pad(d, ((0, 0), (0, 0), (0, need - TOTAL)))
                     if need > TOTAL else d)
            if mode == "pure_forward":
                # no scan/framing: lax.map over preconditioned fixed chunks
                frames = jnp.broadcast_to(
                    datap[:, :, :WINDOW], (S, C, WINDOW)
                )
                batch = jnp.tile(frames, (CHUNK // S, 1, 1))  # (CHUNK, C, WINDOW)
                stacked = jnp.broadcast_to(batch, (n_steps,) + batch.shape)
                out = jax.lax.map(fwd, stacked)
                return jnp.sum(out[..., ::997])

            if mode in ("frame", "condition", "forward"):
                def step(carry, i):
                    sp = jax.lax.dynamic_slice_in_dim(
                        datap, i * (wpc * STRIDE), span, axis=-1)
                    fr = frame_windows_uniform(sp, wpc, STRIDE, WINDOW)
                    fr2 = fr.reshape(wpc * S, C, WINDOW)
                    if mode == "frame":
                        # FULL reduction: the r4 strided-sample probe let XLA
                        # dead-code-skip most framing/conditioning work
                        # (caveat lines above); a full sum forces every
                        # element to be computed
                        return carry + jnp.sum(fr2), None
                    fr2 = cond(fr2)
                    if mode == "condition":
                        return carry + jnp.sum(fr2), None
                    pr = fwd(fr2).reshape(wpc, S, 3, WINDOW)
                    wmask = ((i * wpc + jnp.arange(wpc)) < N).astype(pr.dtype)
                    pr = pr * wmask[:, None, None, None]
                    return carry + jnp.sum(pr), None

                out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n_steps))
                return out

            # mode == "stack": the full production accumulation
            def step(acc, i):
                sp = jax.lax.dynamic_slice_in_dim(
                    datap, i * (wpc * STRIDE), span, axis=-1)
                fr = frame_windows_uniform(sp, wpc, STRIDE, WINDOW)
                pr = fwd(cond(fr.reshape(wpc * S, C, WINDOW)))
                pr = pr.reshape(wpc, S, 3, WINDOW)
                wmask = ((i * wpc + jnp.arange(wpc)) < N).astype(pr.dtype)
                pr = pr * wmask[:, None, None, None]
                loc = jax.vmap(
                    lambda q: overlap_stack_uniform(
                        q, STRIDE, blinding=(500, 500), stacking="avg",
                        return_sums=True)[0]
                )(jnp.moveaxis(pr, 1, 0))
                cur = jax.lax.dynamic_slice_in_dim(
                    acc, i * (wpc * STRIDE), local_len, axis=-1)
                acc = jax.lax.dynamic_update_slice_in_dim(
                    acc, cur + loc, i * (wpc * STRIDE), axis=-1)
                return acc, None

            acc0 = jnp.zeros((S, 3, acc_len), dtype=jnp.float32)
            acc, _ = jax.lax.scan(step, acc0, jnp.arange(n_steps))
            return jnp.sum(acc[..., ::997])

        return run

    results = {"stage": "scan_breakdown", "n_windows_per_iter": S * N,
               "wpc": wpc, "n_steps": n_steps}
    for mode in ("pure_forward", "frame", "condition", "forward", "stack"):
        t = bench_loop(build(mode), data, iters_a=4, iters_b=24)
        results[f"{mode}_ms_per_iter"] = round(t * 1000, 2)
        results[f"{mode}_windows_per_s"] = round(S * N / t, 1)
        log({k: results[k] for k in ("stage", f"{mode}_ms_per_iter",
                                     f"{mode}_windows_per_s")})

    # full program incl. trigger, via the production entry point
    picker = WaveformPicker(model, params)
    starts = np.arange(N) * STRIDE
    run_full = picker._fused_classify_fn(
        S, N, TOTAL, (500, 500), "avg", (0.10141666, 0.22, 0.22), 64, CHUNK,
        stride=STRIDE)
    st = jnp.asarray(starts)

    def full_op(d):
        res = run_full(picker.params, d, st)
        return sum(jnp.sum(v[1]) for v in res.values())

    t = bench_loop(full_op, data, iters_a=4, iters_b=24)
    results["full_ms_per_iter"] = round(t * 1000, 2)
    results["full_windows_per_s"] = round(S * N / t, 1)
    log(results)


def stage_fused_forward(variants=None, precisions=("float32", "bfloat16")):
    """r4 fused-inference transforms: merged LSTM scans (8 sequential 47-step
    scans → 4 via lstm_multi) + grouped decoder convs (det/P/S branches as
    ONE feature_group_count=3 conv stack) vs the reference per-branch
    program. ALL heads are consumed through a strided reduction (the r4 DCE
    lesson: an unconsumed head lets XLA delete its whole decoder branch)."""
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    B, C, W = 256, 3, 6000
    rng = np.random.default_rng(0)
    data = rng.normal(size=(B, C, W)).astype(np.float32)

    if variants is None:
        variants = (False, "lstm", "grouped", "blockdiag",
                    "lstm+grouped", "lstm+blockdiag")
    for precision in precisions:
        if precision == "bfloat16":
            p_use = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), params)
        else:
            p_use = params
        for fused in variants:
            def op(d):
                if precision == "bfloat16":
                    d = d.astype(jnp.bfloat16)
                det, p, s = model.apply(p_use, d, fused=fused)
                return (jnp.sum(det[..., ::997]) + jnp.sum(p[..., ::997])
                        + jnp.sum(s[..., ::997])).astype(jnp.float32)

            t = bench_loop(op, data, iters_a=4, iters_b=24)
            log({"stage": "fused_forward", "model": "eqtransformer",
                 "precision": precision, "fused": str(fused), "batch": B,
                 "ms_per_iter": round(t * 1000, 2),
                 "windows_per_s": round(B / t, 1)})


def stage_forward_stages():
    """Split the EQT forward's wall time BY STAGE with cumulative-prefix
    ablation (`EQTransformer.apply(stop_after=...)`): each prefix returns its
    live intermediate (no DCE), successive differences are the per-stage
    cost. Decides where the 1.72 ms batch-256 forward actually goes —
    candidate bounds: the 8×47-step LSTM scans (sequential-latency), the
    additive attention's O(B·T²·U) tanh (VPU-transcendental, explains the
    bf16 no-win), or the upsampling decoders (HBM traffic)."""
    import jax
    import jax.numpy as jnp

    from volpick_tpu.models import from_pretrained

    model, params = from_pretrained(
        "eqtransformer", search_paths=["/root/reference/Final_models/volpick"]
    )
    B, C, W = 256, 3, 6000
    rng = np.random.default_rng(0)
    data = rng.normal(size=(B, C, W)).astype(np.float32)

    prefixes = ("encoder", "res_cnn", "bilstm", "transformer", "pick", None)
    times = {}
    for stop in prefixes:
        def op(d, stop=stop):
            out = model.apply(params, d, stop_after=stop)
            if not isinstance(out, tuple):
                out = (out,)
            # consume EVERY output tensor (strided) so no branch is DCE'd
            return sum(jnp.sum(o[..., ::97]) for o in out).astype(jnp.float32)

        t = bench_loop(op, data, iters_a=4, iters_b=24)
        times[stop or "full"] = t
        log({"stage": "forward_stages", "model": "eqtransformer", "batch": B,
             "prefix": stop or "full", "ms_per_iter": round(t * 1000, 3),
             "windows_per_s": round(B / t, 1)})

    order = ["encoder", "res_cnn", "bilstm", "transformer", "pick", "full"]
    prev = 0.0
    deltas = {}
    for name in order:
        deltas[name] = times[name] - prev
        prev = times[name]
    log({"stage": "forward_stages", "model": "eqtransformer", "batch": B,
         "deltas_ms": {k: round(v * 1000, 3) for k, v in deltas.items()},
         "note": "per-stage cost = successive prefix differences; 'full' "
                 "delta = decoders + output convs"})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rescnn", action="store_true")
    ap.add_argument("--axes", action="store_true")
    ap.add_argument("--breakdown", action="store_true")
    ap.add_argument("--chunks", action="store_true")
    ap.add_argument("--trigger", action="store_true")
    ap.add_argument("--classify-methods", action="store_true")
    ap.add_argument("--classify-archs", action="store_true")
    ap.add_argument("--annotate", action="store_true")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--scan-breakdown", action="store_true")
    ap.add_argument("--fused-forward", action="store_true")
    ap.add_argument("--forward-stages", action="store_true")
    ap.add_argument("--fused-variants", default=None,
                    help="comma list for --fused-forward (e.g. "
                         "'False,bandattn,polyup,bandattn+polyup'); "
                         "fp32 only when set")
    ap.add_argument("--train-e2e", action="store_true")
    ap.add_argument("--classify-chunks", action="store_true")
    ap.add_argument("--precision", default="float32",
                    help="picker precision for --classify-chunks (float32|bfloat16)")
    ap.add_argument("--arch", default="eqtransformer",
                    help="architecture for --classify-chunks")
    args = ap.parse_args()

    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    import jax

    log({"event": "probe_start", "jax": jax.__version__,
         "backend": jax.default_backend()})
    if args.rescnn:
        stage_rescnn()
    elif args.axes:
        stage_axes()
    elif args.breakdown:
        stage_breakdown()
    elif args.chunks:
        stage_chunks()
    elif args.trigger:
        stage_trigger()
    elif args.classify_methods:
        stage_classify_methods()
    elif args.classify_archs:
        stage_classify_archs()
    elif args.annotate:
        stage_annotate()
    elif args.profile:
        stage_profile()
    elif args.train:
        stage_train()
    elif args.scan_breakdown:
        stage_scan_breakdown()
    elif args.fused_forward:
        if args.fused_variants:
            vs = tuple(False if v in ("False", "0") else v
                       for v in args.fused_variants.split(","))
            stage_fused_forward(variants=vs, precisions=("float32",))
        else:
            stage_fused_forward()
    elif args.forward_stages:
        stage_forward_stages()
    elif args.train_e2e:
        stage_train_e2e()
    elif args.classify_chunks:
        stage_classify_chunks(args.arch, args.precision)
    else:
        stage_conditioning()


if __name__ == "__main__":
    main()
