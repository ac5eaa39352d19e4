"""End-to-end annotate()/classify() tests with the published weights on
synthetic streams with known event times."""

import os

import numpy as np
import jax
import pytest

from volpick_tpu.core import Stream, Trace, UTC

WEIGHTS = os.environ.get("VOLPICK_TPU_MODELS", "/root/reference/Final_models/volpick")
needs_weights = pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS, "phasenet", "volpick.pt.v1")),
    reason="published volpick weights not available",
)


def synth_event_stream(rng, station="TST1", duration=90.0, p_at=40.0, s_at=43.0, sr=100.0):
    """Synthetic VT-ish event: band-limited P on Z, stronger S on horizontals."""
    n = int(duration * sr)
    t = np.arange(n) / sr
    data = rng.normal(size=(3, n)).astype(np.float64) * 0.02
    # P: 8 Hz burst starting at p_at with fast rise, exponential coda
    env_p = np.where(t >= p_at, np.exp(-(t - p_at) / 1.5), 0.0) * (1 - np.exp(-np.clip(t - p_at, 0, None) / 0.05))
    data[0] += np.sin(2 * np.pi * 8 * t) * env_p * 1.5
    data[1:] += np.sin(2 * np.pi * 8 * t) * env_p * 0.4
    # S: 4 Hz burst at s_at, stronger on horizontals
    env_s = np.where(t >= s_at, np.exp(-(t - s_at) / 2.5), 0.0) * (1 - np.exp(-np.clip(t - s_at, 0, None) / 0.08))
    data[1] += np.sin(2 * np.pi * 4 * t + 0.5) * env_s * 2.5
    data[2] += np.sin(2 * np.pi * 4 * t + 1.1) * env_s * 2.2
    data[0] += np.sin(2 * np.pi * 4 * t) * env_s * 0.8
    t0 = UTC("2024-06-01T00:00:00")
    return Stream(
        [
            Trace(
                data[i],
                dict(network="XX", station=station, channel=f"HH{c}", sampling_rate=sr, starttime=t0),
            )
            for i, c in enumerate("ZNE")
        ]
    ), t0


@needs_weights
class TestPhaseNetClassify:
    @pytest.fixture(scope="class")
    def picker(self):
        from volpick_tpu.models import from_pretrained
        from volpick_tpu.picker import WaveformPicker

        model, params = from_pretrained("phasenet", search_paths=[WEIGHTS])
        return WaveformPicker(model, params)

    def test_annotate_shapes_and_names(self, picker, rng):
        st, t0 = synth_event_stream(rng)
        ann = picker.annotate(st, overlap=2500, blinding=(500, 500))
        assert len(ann) == 3  # P, S, N curves
        chans = {tr.stats.channel for tr in ann}
        assert chans == {"PhaseNet_P", "PhaseNet_S", "PhaseNet_N"}
        assert all(tr.stats.npts == 9000 for tr in ann)
        p = ann.select(channel="PhaseNet_P")[0].data
        assert 0 <= p.min() and p.max() <= 1

    def test_classify_finds_event(self, picker, rng):
        st, t0 = synth_event_stream(rng, p_at=40.0, s_at=43.0)
        out = picker.classify(st, overlap=2500, blinding=(500, 500))
        p_picks = out.picks.select(phase="P")
        s_picks = out.picks.select(phase="S")
        assert len(p_picks) >= 1, f"no P picks: {out.picks}"
        assert len(s_picks) >= 1, f"no S picks: {out.picks}"
        # strongest P pick within ±1 s of the constructed onset
        best_p = max(p_picks, key=lambda p: p.peak_value)
        assert abs((best_p.peak_time - t0) - 40.0) < 1.0
        best_s = max(s_picks, key=lambda p: p.peak_value)
        assert abs((best_s.peak_time - t0) - 43.0) < 1.5
        assert best_p.trace_id == "XX.TST1."

    def test_classify_noise_only(self, picker, rng):
        n = 9000
        data = rng.normal(size=(3, n)) * 0.02
        st = Stream(
            [
                Trace(data[i], dict(network="XX", station="NOIS", channel=f"HHZNE"[0:2] + c, sampling_rate=100.0, starttime=UTC(0)))
                for i, c in enumerate("ZNE")
            ]
        )
        out = picker.classify(st, overlap=2500, blinding=(500, 500))
        assert len(out.picks) == 0

    def test_multi_station_batch(self, picker, rng):
        st1, t0 = synth_event_stream(rng, station="AAA", p_at=30.0, s_at=33.0)
        st2, _ = synth_event_stream(rng, station="BBB", p_at=50.0, s_at=54.0)
        st = Stream(list(st1) + list(st2))
        out = picker.classify(st, overlap=2500, blinding=(500, 500))
        ids = {p.trace_id for p in out.picks}
        assert {"XX.AAA.", "XX.BBB."} <= ids
        for sta, p_at in (("AAA", 30.0), ("BBB", 50.0)):
            pp = [p for p in out.picks if sta in p.trace_id and p.phase == "P"]
            best = max(pp, key=lambda p: p.peak_value)
            assert abs(best.peak_time.timestamp - (t0.timestamp + p_at)) < 1.0

    def test_span_conditioning_matches_per_window_path(self, picker, rng):
        """The span-conditioning default of the uniform fused scan (stats via
        one strided conv, `condition_windows_from_span`) must reproduce the
        per-window conditioning path: identical pick sets, curves equal to
        float tolerance (VERDICT r4 item 2: conditioning fused into the scan
        body's framing arithmetic)."""
        from volpick_tpu.picker import WaveformPicker

        st, t0 = synth_event_stream(rng, p_at=40.0, s_at=43.0)
        p_off = WaveformPicker(picker.model, picker.params, span_conditioning=False)
        assert picker.span_conditioning  # default ON
        ann_on = picker.annotate(st, overlap=2500, blinding=(500, 500))
        ann_off = p_off.annotate(st, overlap=2500, blinding=(500, 500))
        for tr_on, tr_off in zip(ann_on, ann_off):
            assert tr_on.stats.channel == tr_off.stats.channel
            np.testing.assert_allclose(tr_on.data, tr_off.data, atol=1e-4)
        out_on = picker.classify(st, overlap=2500, blinding=(500, 500))
        out_off = p_off.classify(st, overlap=2500, blinding=(500, 500))
        assert [(p.phase, p.peak_time.timestamp) for p in out_on.picks] == [
            (p.phase, p.peak_time.timestamp) for p in out_off.picks
        ]

    def test_gappy_stream_picks_both_segments(self, picker, rng):
        """A station with two disjoint segments (a recording gap) classifies
        in one call: the segments land at their correct absolute offsets in
        the zero-filled instrument buffer (`_group_arrays`), picks appear in
        BOTH segments at the right absolute times, and the silent gap yields
        none — real continuous-station data is gappy."""
        st_a, t0 = synth_event_stream(rng, duration=60.0, p_at=30.0, s_at=33.0)
        st_b, _ = synth_event_stream(rng, duration=60.0, p_at=30.0, s_at=34.0)
        for tr in st_b:  # shift segment B two minutes later: 60 s gap
            tr.stats.starttime = t0 + 120.0
        st = Stream(list(st_a) + list(st_b))
        out = picker.classify(st, overlap=2500, blinding=(500, 500))
        p_times = sorted(p.peak_time.timestamp - t0.timestamp
                         for p in out.picks.select(phase="P"))
        assert any(abs(x - 30.0) < 1.0 for x in p_times), p_times
        assert any(abs(x - 150.0) < 1.0 for x in p_times), p_times
        in_gap = [x for x in (p.peak_time.timestamp - t0.timestamp
                              for p in out.picks) if 62.0 < x < 118.0]
        assert not in_gap, f"picks inside the recording gap: {in_gap}"

    def test_misaligned_components_and_foreign_rate(self, picker, rng):
        """Components starting at different times align by absolute offset
        in the instrument buffer, and a 50 Hz stream is resampled to the
        model rate before picking (`_group_arrays`): the pick still lands at
        the correct absolute time."""
        st, t0 = synth_event_stream(rng, duration=60.0, p_at=30.0, s_at=33.0)
        # decimate every trace to 50 Hz and desynchronize the horizontals
        for k, tr in enumerate(st):
            tr.data = tr.data[::2].copy()
            tr.stats.sampling_rate = 50.0
            if k > 0:  # N/E start 2 s late (drop their first 100 samples)
                tr.data = tr.data[100:].copy()
                tr.stats.starttime = t0 + 2.0
        out = picker.classify(st, overlap=2500, blinding=(500, 500))
        pp = out.picks.select(phase="P")
        assert pp, f"no P picks: {out.picks}"
        best = max(pp, key=lambda p: p.peak_value)
        assert abs(best.peak_time.timestamp - t0.timestamp - 30.0) < 1.0

    def test_trigger_method_env_identical_picks(self, picker, rng, monkeypatch):
        """VOLPICK_TRIGGER_METHOD routes classify through each trigger
        lowering (incl. the fused-emission pallas_full kernel, interpret
        mode on CPU) with bit-identical pick buffers."""
        st, _ = synth_event_stream(rng, duration=60.0)
        data = np.stack([np.stack([tr.data for tr in st])]).astype(np.float32)
        thr = {"P": 0.1, "S": 0.1, "N": 2.0}
        base = None
        for method in ("blocked", "pallas_full"):
            monkeypatch.setenv("VOLPICK_TRIGGER_METHOD", method)
            from volpick_tpu.picker import WaveformPicker

            p2 = WaveformPicker(picker.model, picker.params)
            res = p2.classify_arrays(data, thr, overlap=1500, blinding=(250, 250))
            flat = {k: tuple(np.asarray(a) for a in v) for k, v in res.items()}
            if base is None:
                base = flat
                assert sum(v[2].sum() for v in flat.values()) > 0
            else:
                for lab in base:
                    for a, b in zip(base[lab], flat[lab]):
                        np.testing.assert_array_equal(a, b, err_msg=f"{method}/{lab}")

    def test_short_stream_pad(self, picker, rng):
        # shorter than one window → must pad, not crash
        data = rng.normal(size=(3, 1000)) * 0.01
        st = Stream(
            [
                Trace(data[i], dict(network="XX", station="SHRT", channel=f"HH{c}", sampling_rate=100.0, starttime=UTC(0)))
                for i, c in enumerate("ZNE")
            ]
        )
        ann = picker.annotate(st)
        assert all(tr.stats.npts == 1000 for tr in ann)


@needs_weights
class TestEQTClassify:
    @pytest.fixture(scope="class")
    def picker(self):
        from volpick_tpu.models import from_pretrained
        from volpick_tpu.picker import WaveformPicker

        model, params = from_pretrained("eqtransformer", search_paths=[WEIGHTS])
        return WaveformPicker(model, params)

    def test_classify_eqt(self, picker, rng):
        st, t0 = synth_event_stream(rng, duration=120.0, p_at=60.0, s_at=64.0)
        out = picker.classify(st, overlap=5500, blinding=(500, 500), batch_size=64)
        assert len(out.detections) >= 1
        p_picks = out.picks.select(phase="P")
        assert len(p_picks) >= 1
        best_p = max(p_picks, key=lambda p: p.peak_value)
        assert abs((best_p.peak_time - t0) - 60.0) < 1.5
        det = out.detections[0]
        assert det.start_time.timestamp <= t0.timestamp + 62.0 <= det.end_time.timestamp + 5.0

    def test_annotate_channels(self, picker, rng):
        st, _ = synth_event_stream(rng, duration=70.0)
        ann = picker.annotate(st, overlap=3000, blinding=(500, 500), batch_size=32)
        chans = {tr.stats.channel for tr in ann}
        assert chans == {"EQTransformer_Detection", "EQTransformer_P", "EQTransformer_S"}


@needs_weights
class TestPrecision:
    def test_bf16_picks_close_to_f32(self, rng):
        from volpick_tpu.models import from_pretrained
        from volpick_tpu.picker import WaveformPicker

        model, params = from_pretrained("phasenet", search_paths=[WEIGHTS])
        st, t0 = synth_event_stream(rng, p_at=40.0, s_at=43.0)
        out32 = WaveformPicker(model, params).classify(st, overlap=2500, blinding=(500, 500))
        out16 = WaveformPicker(model, params, precision="bfloat16").classify(
            st, overlap=2500, blinding=(500, 500)
        )
        p32 = max(out32.picks.select(phase="P"), key=lambda p: p.peak_value)
        p16 = max(out16.picks.select(phase="P"), key=lambda p: p.peak_value)
        assert abs(p32.peak_time - p16.peak_time) < 0.1  # within 10 samples
        assert abs(p32.peak_value - p16.peak_value) < 0.05

    def test_bad_precision_rejected(self, rng):
        from volpick_tpu.models import from_pretrained
        from volpick_tpu.picker import WaveformPicker

        model, params = from_pretrained("phasenet", search_paths=[WEIGHTS])
        with pytest.raises(ValueError):
            WaveformPicker(model, params, precision="fp8")


@needs_weights
class TestSegmentedClassify:
    def test_segmented_matches_single_pass(self, rng):
        """Long-stream segmentation must reproduce the single-pass picks."""
        from volpick_tpu.models import from_pretrained
        from volpick_tpu.picker import WaveformPicker

        model, params = from_pretrained("phasenet", search_paths=[WEIGHTS])
        picker = WaveformPicker(model, params)
        sr, n = 100.0, 60000  # 10 minutes
        t = np.arange(n) / sr
        data = rng.normal(size=(1, 3, n)).astype(np.float32) * 0.05
        for p_at in (50.0, 200.0, 310.0, 455.0, 590.0):
            env = np.where(t >= p_at, np.exp(-(t - p_at) / 1.5), 0.0)
            data[0, 0] += np.sin(2 * np.pi * 8 * t) * env * 2
            env_s = np.where(t >= p_at + 3, np.exp(-(t - p_at - 3) / 2.5), 0.0)
            data[0, 1] += np.sin(2 * np.pi * 4 * t) * env_s * 3
            data[0, 2] += np.sin(2 * np.pi * 4 * t) * env_s * 2.6
        thr = {"P": 0.39, "S": 0.34, "N": 2.0}
        full = picker.classify_arrays(data, thr, overlap=1500, blinding=(250, 250))
        seg = picker.classify_arrays(data, thr, overlap=1500, blinding=(250, 250),
                                     max_span=20000)  # forces ~4 segments
        for label in ("P", "S"):
            f_pk = np.sort(full[label][0][0][full[label][2][0]])
            s_pk = np.sort(seg[label][0][0][seg[label][2][0]])
            np.testing.assert_array_equal(f_pk, s_pk)


class TestPerArchBatchSizeDefault:
    """batch_size=None resolves to the measured per-architecture forward-chunk
    optimum (docs/TPU_PROBE.jsonl "classify_chunks": TPUPickNet 64, others
    256); an explicit value always wins."""

    def _capture_chunk(self, picker, batch_size):
        import jax.numpy as jnp

        captured = {}
        orig = picker._fused_classify_fn

        def spy(s, n_win, total, blinding, stacking, thr, max_picks, chunk, **kw):
            captured["chunk"] = chunk
            return orig(s, n_win, total, blinding, stacking, thr, max_picks, chunk, **kw)

        picker._fused_classify_fn = spy
        try:
            picker.classify_arrays(
                np.zeros((1, 3, 4000), np.float32) if picker.in_samples <= 3008
                else np.zeros((1, 3, 7000), np.float32),
                {"P": 0.5, "S": 0.5, "N": 2.0, "Detection": 0.5,
                 "Detection_rg": 0.5, "Detection_lp": 0.5},
                batch_size=batch_size,
            )
        finally:
            picker._fused_classify_fn = orig
        return captured["chunk"]

    def test_defaults_and_override(self, rng):
        import jax
        from volpick_tpu.models import PhaseNet, TPUPickNet
        from volpick_tpu.picker import WaveformPicker

        pn = PhaseNet()
        # the chunk optimum is a model-level ATTRIBUTE (ADVICE r4: dispatching
        # on the display-name string silently missed subclassed/renamed
        # variants) — a model declaring a non-default value wins, and an
        # explicit batch_size overrides everything
        tpn = TPUPickNet(default_classify_batch=64)
        p_pn = WaveformPicker(pn, pn.init(jax.random.PRNGKey(0)))
        p_tpn = WaveformPicker(tpn, tpn.init(jax.random.PRNGKey(0)))
        assert p_pn._default_batch_size() == 256
        assert p_tpn._default_batch_size() == 64
        # v2's measured optimum is its declared default (chunk 128)
        assert WaveformPicker(TPUPickNet(), None)._default_batch_size() == 128
        assert self._capture_chunk(p_pn, None) == 256
        assert self._capture_chunk(p_tpn, None) == 64
        assert self._capture_chunk(p_tpn, 128) == 128


class TestTPNAttnDefault:
    def test_cpu_default_is_xla_and_env_wins(self, rng, monkeypatch):
        """On a CPU backend the default stays the XLA path (no interpret-mode
        cost in tests); VOLPICK_TPN_ATTN overrides; unknown values raise."""
        import jax
        import jax.numpy as jnp
        from volpick_tpu.models import TPUPickNet

        assert jax.default_backend() == "cpu"
        m = TPUPickNet()
        params = m.init(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 3, m.in_samples), jnp.float32)
        ref = m.apply(params, x, attn="xla")
        monkeypatch.delenv("VOLPICK_TPN_ATTN", raising=False)
        np.testing.assert_array_equal(np.asarray(m.apply(params, x)), np.asarray(ref))
        monkeypatch.setenv("VOLPICK_TPN_ATTN", "pallas")
        got = m.apply(params, x)  # interpret-mode pallas on CPU
        assert float(np.abs(np.asarray(got) - np.asarray(ref)).max()) < 1e-5
        monkeypatch.setenv("VOLPICK_TPN_ATTN", "flash")
        with pytest.raises(ValueError):
            m.apply(params, x)

    def test_picker_freezes_attn_at_construction(self, rng, monkeypatch):
        """WaveformPicker resolves the attention implementation ONCE at
        construction (ADVICE r4: compiled programs are cached per picker, so
        a later env-var change must not disagree with the cached executable),
        and a mesh-sharded picker pins the XLA path (pallas_call partitioning
        under sharded inference is unverified)."""
        import jax
        from jax.sharding import Mesh
        from volpick_tpu.models import TPUPickNet
        from volpick_tpu.picker import WaveformPicker

        monkeypatch.delenv("VOLPICK_TPN_ATTN", raising=False)
        m = TPUPickNet(n_layers=1)
        params = m.init(jax.random.PRNGKey(0))
        picker = WaveformPicker(m, params)
        assert m.attn in ("xla", "pallas")
        frozen = m.attn
        monkeypatch.setenv("VOLPICK_TPN_ATTN", "pallas" if frozen == "xla" else "xla")
        assert m.resolve_attn() == frozen  # explicit field beats the env var

        m2 = TPUPickNet(n_layers=1)
        monkeypatch.delenv("VOLPICK_TPN_ATTN", raising=False)
        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        WaveformPicker(m2, params, mesh=mesh)
        assert m2.attn == "xla"
