"""Streaming picker: chunked ingest must reproduce offline classify picks."""

import os

import numpy as np
import pytest

from volpick_tpu.core import Stream, Trace, UTC

WEIGHTS = os.environ.get("VOLPICK_TPU_MODELS", "/root/reference/Final_models/volpick")
needs_weights = pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS, "phasenet", "volpick.pt.v1")),
    reason="published volpick weights not available",
)


@needs_weights
def test_streaming_matches_offline(rng):
    from volpick_tpu.models import from_pretrained
    from volpick_tpu.picker import StreamingPicker, WaveformPicker

    model, params = from_pretrained("phasenet", search_paths=[WEIGHTS])
    picker = WaveformPicker(model, params)

    # 5 minutes with 3 events
    sr, n = 100.0, 30000
    t = np.arange(n) / sr
    data = rng.normal(size=(3, n)).astype(np.float64) * 0.03
    for p_at in (60.0, 150.0, 240.0):
        env = np.where(t >= p_at, np.exp(-(t - p_at) / 1.5), 0.0)
        data[0] += np.sin(2 * np.pi * 8 * t) * env * 2
        env_s = np.where(t >= p_at + 3, np.exp(-(t - p_at - 3) / 2.5), 0.0)
        data[1] += np.sin(2 * np.pi * 4 * t) * env_s * 3
        data[2] += np.sin(2 * np.pi * 4 * t) * env_s * 2.6
    t0 = UTC("2024-03-01T00:00:00")

    def traces(lo, hi):
        return [
            Trace(data[i, lo:hi], dict(network="XX", station="STRM", channel=f"HH{c}",
                                       sampling_rate=sr, starttime=t0 + lo / sr))
            for i, c in enumerate("ZNE")
        ]

    offline = picker.classify(Stream(traces(0, n)), overlap=1500, blinding=(250, 250))
    off_p = sorted(p.peak_time.timestamp for p in offline.picks.select(phase="P"))

    sp = StreamingPicker(picker, overlap=1500, blinding=(250, 250), hop_seconds=20.0)
    got = []
    chunk = 1000  # 10-second chunks
    for lo in range(0, n, chunk):
        for tr in traces(lo, min(lo + chunk, n)):
            got.extend(sp.ingest(tr))
    got.extend(sp.flush())
    got_p = sorted(p.peak_time.timestamp for p in got if p.phase == "P")

    assert len(got_p) == len(off_p), f"{len(got_p)} streamed vs {len(off_p)} offline"
    np.testing.assert_allclose(got_p, off_p, atol=0.5)
    # no duplicates
    assert len(got_p) == len(set(np.round(got_p, 2)))


@needs_weights
def test_multichip_classify_matches_single(rng):
    """Sharded (8 virtual devices) classify_arrays == single-device picks."""
    import jax
    from volpick_tpu.models import from_pretrained
    from volpick_tpu.parallel import make_mesh
    from volpick_tpu.picker import WaveformPicker

    assert jax.device_count() == 8
    model, params = from_pretrained("phasenet", search_paths=[WEIGHTS])
    sr, n, S = 100.0, 12000, 8
    t = np.arange(n) / sr
    data = rng.normal(size=(S, 3, n)).astype(np.float32) * 0.05
    for s in range(S):
        p_at = 20.0 + 8 * s
        env = np.where(t >= p_at, np.exp(-(t - p_at) / 1.5), 0.0)
        data[s, 0] += np.sin(2 * np.pi * 8 * t) * env * 2
        env_s = np.where(t >= p_at + 3, np.exp(-(t - p_at - 3) / 2.5), 0.0)
        data[s, 1] += np.sin(2 * np.pi * 4 * t) * env_s * 3

    thr = {"P": 0.39, "S": 0.34, "N": 2.0}
    single = WaveformPicker(model, params).classify_arrays(
        data, thr, overlap=1500, blinding=(250, 250), batch_size=32
    )
    sharded = WaveformPicker(model, params, mesh=make_mesh(8)).classify_arrays(
        data, thr, overlap=1500, blinding=(250, 250), batch_size=32
    )
    for label in ("P", "S"):
        np.testing.assert_array_equal(single[label][0], sharded[label][0])  # peak idx
        np.testing.assert_allclose(single[label][1], sharded[label][1], atol=1e-5)
