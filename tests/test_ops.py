"""Unit tests for the on-device signal kernels against numpy/scipy golden values."""

import numpy as np
import jax.numpy as jnp
import pytest

from volpick_tpu.ops import (
    demean,
    detrend_linear,
    normalize_amplitude,
    window_starts,
    frame_windows,
    overlap_stack,
    steered_window_indices,
    trigger_onset_numpy,
    extract_picks_batched,
    probabilistic_labels,
    detection_labels,
    frequency_index,
    snr_db,
)
from volpick_tpu.ops.signal import sosfilt, sosfilt_coeffs_bandpass, resample_poly_device
from volpick_tpu.ops.triggers import picks_from_prob_numpy
from volpick_tpu.ops.labels import renormalize_labels
from volpick_tpu.ops.windows import pad_frame


class TestSignal:
    def test_demean(self, rng):
        x = rng.normal(size=(4, 3, 100)).astype(np.float32)
        y = np.asarray(demean(jnp.asarray(x)))
        np.testing.assert_allclose(y.mean(-1), 0, atol=1e-5)

    def test_detrend_matches_scipy(self, rng):
        from scipy.signal import detrend

        x = rng.normal(size=(2, 3, 256)).astype(np.float64) + np.linspace(0, 5, 256)
        y = np.asarray(detrend_linear(jnp.asarray(x)))
        ref = detrend(x, axis=-1, type="linear")
        np.testing.assert_allclose(y, ref, atol=1e-5)  # jax default float32

    def test_peak_norm_per_channel(self, rng):
        x = rng.normal(size=(2, 3, 50)).astype(np.float32) * 100
        y = np.asarray(normalize_amplitude(jnp.asarray(x), "peak", per_channel=True))
        np.testing.assert_allclose(np.abs(y).max(-1), 1.0, rtol=1e-4)

    def test_std_norm_joint(self, rng):
        x = rng.normal(size=(2, 3, 50)).astype(np.float64)
        y = np.asarray(normalize_amplitude(jnp.asarray(x), "std"))
        for i in range(2):
            np.testing.assert_allclose(y[i].std(), 1.0, rtol=1e-3)

    def test_condition_windows_from_span_matches_per_window(self, rng):
        """Span conditioning (stats via one strided conv of the raw span) must
        equal the per-window composition frame → detrend/demean → peak/std
        norm — the fused-classify default rides on this equality."""
        from volpick_tpu.ops.signal import condition_windows_from_span
        from volpick_tpu.ops.windows import frame_windows_uniform

        # stride | window exercises the block-sum fast path; 130 the conv path
        for stride, window, n_win in ((40, 120, 7), (40, 130, 6)):
            span = (n_win - 1) * stride + window
            # offset + trend so detrend/demean actually do work
            x = (rng.normal(size=(2, 3, span)) * 3 + 50
                 + np.linspace(0, 7, span)).astype(np.float32)
            self._check(x, stride, window, n_win)

    def _check(self, x, stride, window, n_win):
        from volpick_tpu.ops.signal import condition_windows_from_span
        from volpick_tpu.ops.windows import frame_windows_uniform

        for detrend, norm in ((True, "peak"), (False, "peak"), (True, "std")):
            fr = frame_windows_uniform(jnp.asarray(x), n_win, stride, window)
            ref = detrend_linear(fr) if detrend else demean(fr)
            ref = np.asarray(normalize_amplitude(ref, norm, per_channel=True))
            got = np.asarray(condition_windows_from_span(
                jnp.asarray(x), n_win, stride, window,
                detrend=detrend, norm=norm))
            np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"{detrend},{norm}")

    def test_sosfilt_matches_scipy_x64(self, rng):
        from scipy.signal import sosfilt as scipy_sosfilt
        import jax

        sos = sosfilt_coeffs_bandpass(1.0, 20.0, 100.0)
        x = rng.normal(size=(2, 3, 400)).astype(np.float64)
        jax.config.update("jax_enable_x64", True)
        try:
            y = np.asarray(sosfilt(jnp.asarray(x, dtype=jnp.float64), sos))
        finally:
            jax.config.update("jax_enable_x64", False)
        ref = scipy_sosfilt(sos, x, axis=-1)
        np.testing.assert_allclose(y, ref, atol=1e-10)

    def test_sosfilt_float32_wideband(self, rng):
        # float32 biquads are accurate away from extreme band edges
        from scipy.signal import sosfilt as scipy_sosfilt

        sos = sosfilt_coeffs_bandpass(5.0, 15.0, 100.0, order=2)
        x = rng.normal(size=(2, 3, 400)).astype(np.float32)
        y = np.asarray(sosfilt(jnp.asarray(x), sos))
        ref = scipy_sosfilt(sos.astype(np.float32), x, axis=-1)
        np.testing.assert_allclose(y, ref, atol=2e-3)

    def test_resample_poly_close_to_scipy(self, rng):
        from scipy.signal import resample_poly

        t = np.arange(1000) / 200.0
        x = np.sin(2 * np.pi * 5 * t)[None, None, :]
        y = np.asarray(resample_poly_device(jnp.asarray(x), 1, 2))
        ref = resample_poly(x, 1, 2, axis=-1)
        assert y.shape[-1] == ref.shape[-1]
        # interior samples agree closely (edges differ by FIR boundary handling)
        np.testing.assert_allclose(y[..., 50:-50], ref[..., 50:-50], atol=5e-3)


class TestWindows:
    def test_window_starts_cover(self):
        starts = window_starts(10000, 6000, 5500)
        assert starts[0] == 0
        assert starts[-1] + 6000 == 10000
        assert np.all(np.diff(starts) <= 500)

    def test_window_starts_short(self):
        assert list(window_starts(100, 3001, 1500)) == [0]

    def test_frame_and_stack_roundtrip(self, rng):
        total = 9000
        window, overlap = 3001, 1500
        x = rng.normal(size=(3, total)).astype(np.float32)
        starts = window_starts(total, window, overlap)
        frames = frame_windows(jnp.asarray(x), jnp.asarray(starts), window)
        assert frames.shape == (len(starts), 3, window)
        # stacking identical content back = original where covered
        out = overlap_stack(frames, jnp.asarray(starts), total, blinding=(0, 0))
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)

    def test_overlap_stack_avg_blinding(self):
        # two windows of constant value 1 and 3 overlapping half-way
        window, total = 8, 12
        preds = np.stack([np.full((1, window), 1.0), np.full((1, window), 3.0)])
        starts = np.array([0, 4])
        out = np.asarray(
            overlap_stack(jnp.asarray(preds, dtype=jnp.float32), jnp.asarray(starts), total, blinding=(1, 1))
        )[0]
        # samples covered by only window0: value 1; overlap: 2; only window1: 3
        assert out[2] == 1.0
        np.testing.assert_allclose(out[5], 2.0)
        assert out[10] == 3.0
        # blinded-out, uncovered edges → 0
        assert out[0] == 0.0

    def test_overlap_stack_max(self):
        window, total = 4, 8
        preds = np.zeros((2, 1, window), dtype=np.float32)
        preds[0, 0, :] = 0.5
        preds[1, 0, :] = 0.9
        out = np.asarray(
            overlap_stack(jnp.asarray(preds), jnp.asarray(np.array([0, 2])), total, stacking="max")
        )[0]
        assert out[3] == pytest.approx(0.9)
        assert out[0] == pytest.approx(0.5)

    def test_steered_window(self):
        w0, lo, hi = steered_window_indices(10000, np.array([4000]), np.array([7000]), 3001)
        assert lo[0] >= 0 and hi[0] - lo[0] == 3000
        assert 0 <= w0[0] <= 10000 - 3001
        # short trace → pad
        w0, lo, hi = steered_window_indices(2000, np.array([0]), np.array([2000]), 3001)
        assert w0[0] == 0

    def test_pad_frame(self):
        data = np.arange(12, dtype=np.float32).reshape(2, 6)
        out = pad_frame(data, -2, 6)
        assert out.shape == (2, 6)
        np.testing.assert_array_equal(out[0], [0, 0, 0, 1, 2, 3])


class TestTriggers:
    def test_trigger_onset_basic(self):
        prob = np.array([0.0, 0.2, 0.6, 0.8, 0.3, 0.1, 0.0, 0.6, 0.9, 0.0])
        trig = trigger_onset_numpy(prob, 0.5, 0.25)
        assert trig == [(2, 4), (7, 8)]
        # strictly-greater comparison: 0.5 does not cross thres1=0.5
        prob2 = np.array([0.0, 0.3, 0.5, 0.3, 0.0])
        assert trigger_onset_numpy(prob2, 0.5, 0.25) == []

    def test_trigger_onset_subthreshold_run(self):
        prob = np.array([0.0, 0.3, 0.4, 0.3, 0.0])  # never above thres1
        assert trigger_onset_numpy(prob, 0.5, 0.25) == []

    def test_device_matches_numpy_oracle(self, rng):
        # random smooth probability curves
        from scipy.ndimage import gaussian_filter1d

        b, w = 16, 512
        prob = gaussian_filter1d(rng.random((b, w)), 8, axis=-1).astype(np.float32)
        prob = prob / prob.max(axis=-1, keepdims=True)
        thr = 0.8
        idx, val, valid = extract_picks_batched(jnp.asarray(prob), thr, max_picks=16)
        idx, val, valid = np.asarray(idx), np.asarray(val), np.asarray(valid)
        for i in range(b):
            ref_idx, ref_val = picks_from_prob_numpy(prob[i], thr)
            got = idx[i][valid[i]]
            np.testing.assert_array_equal(got, ref_idx[:16])
            np.testing.assert_allclose(val[i][valid[i]], ref_val[:16], rtol=1e-5)

    def test_blocked_compaction_matches_flat_sort(self):
        """_earliest_k (two-stage tiled top_k on long rows) is exact: the k
        smallest per row, ascending, sentinel-padded — vs a full sort."""
        from volpick_tpu.ops.triggers import _earliest_k

        rng = np.random.default_rng(7)
        for _ in range(10):
            b, w = int(rng.integers(1, 7)), int(rng.integers(8193, 30000))
            order = np.full((b, w), w, np.int32)
            for i in range(b):
                pos = rng.choice(w, size=rng.integers(0, 180), replace=False)
                order[i, pos] = pos
            got = np.asarray(_earliest_k(jnp.asarray(order), w, 64))
            want = np.sort(order, axis=-1)[:, :64]
            np.testing.assert_array_equal(got, want)

    def test_device_edge_cases(self):
        # trigger still on at end; trigger on at start
        prob = np.array([[0.9, 0.8, 0.1, 0.0, 0.3, 0.6, 0.7, 0.7]], dtype=np.float32)
        idx, val, valid = extract_picks_batched(jnp.asarray(prob), 0.5, max_picks=4)
        ref_idx, ref_val = picks_from_prob_numpy(prob[0], 0.5)
        np.testing.assert_array_equal(np.asarray(idx)[0][np.asarray(valid)[0]], ref_idx)


class TestLabels:
    def test_gaussian_peak_one(self):
        onsets = jnp.asarray(np.array([[100.0, 200.0]]))
        y = np.asarray(probabilistic_labels(onsets, 300, sigma=20))
        assert y.shape == (1, 3, 300)
        assert y[0, 0, 100] == pytest.approx(1.0)
        assert y[0, 1, 200] == pytest.approx(1.0)
        # gaussian value at 1 sigma
        assert y[0, 0, 120] == pytest.approx(np.exp(-0.5), rel=1e-5)
        # noise row complements
        np.testing.assert_allclose(
            y[0, 2], np.clip(1 - y[0, 0] - y[0, 1], 0, 1), atol=1e-6
        )

    def test_absent_phase_zero(self):
        onsets = jnp.asarray(np.array([[np.nan, 150.0]]))
        y = np.asarray(probabilistic_labels(onsets, 300, sigma=10))
        assert y[0, 0].max() == 0.0
        assert y[0, 1].max() == pytest.approx(1.0)

    def test_triangle_box(self):
        onsets = jnp.asarray(np.array([[50.0]]))
        tri = np.asarray(probabilistic_labels(onsets, 100, sigma=10, shape="triangle", noise_column=False))
        assert tri[0, 0, 50] == pytest.approx(1.0)
        assert tri[0, 0, 60] == pytest.approx(0.0, abs=1e-6)
        assert tri[0, 0, 55] == pytest.approx(0.5)
        box = np.asarray(probabilistic_labels(onsets, 100, sigma=10, shape="box", noise_column=False))
        assert box[0, 0, 40:61].min() == 1.0
        assert box[0, 0, 39] == 0.0

    def test_detection_labels(self):
        det = np.asarray(detection_labels(jnp.asarray([100.0]), jnp.asarray([200.0]), 600))
        assert det.shape == (1, 1, 600)
        # span [100, 200 + 1.4*100] = [100, 340]
        assert det[0, 0, 100] == 1.0 and det[0, 0, 340] == 1.0
        assert det[0, 0, 99] == 0.0 and det[0, 0, 341] == 0.0

    def test_renormalize(self):
        y = np.zeros((1, 3, 10), dtype=np.float32)
        y[0, 0, 5] = 0.8
        y[0, 1, 5] = 0.5
        out = np.asarray(renormalize_labels(jnp.asarray(y)))
        assert out[0, 2, 5] == 0.0  # clipped at 0
        assert out[0, 2, 0] == 1.0


class TestFeatures:
    def test_frequency_index_matches_reference_formula(self, rng):
        from scipy.fft import fft, fftfreq
        from scipy.signal import windows as sw

        x = rng.normal(size=2000)
        dt = 0.01
        n = len(x)
        spec = fft(x * sw.hann(n))[: n // 2]
        freq = fftfreq(n, dt)[: n // 2]
        hi = np.logical_and(freq > 10, freq < 15)
        lo = np.logical_and(freq > 1, freq < 5)
        ref = np.log10(np.mean(np.abs(spec)[hi]) / np.mean(np.abs(spec)[lo]))
        got = float(frequency_index(jnp.asarray(x), dt))
        assert got == pytest.approx(ref, abs=1e-4)

    def test_snr_matches_reference_formula(self, rng):
        x = rng.normal(size=(2, 3, 3000))
        x[:, :, 1000:] *= 10  # signal after P
        p = np.array([1000.0, 1000.0])
        s = np.array([1500.0, np.nan])
        snrs, mean = snr_db(jnp.asarray(x), jnp.asarray(p), jnp.asarray(s), winlen=500)
        snrs = np.asarray(snrs)
        # manual reference computation, trace 0 (has S)
        noi = np.percentile(np.abs(x[0, 0, 500:1000]), 95)
        sig = np.percentile(np.abs(x[0, 0, 1500:2000]), 95)
        assert snrs[0, 0] == pytest.approx(20 * np.log10(sig / noi), abs=0.05)
        # trace 1 (no S): signal window starts at P
        noi = np.percentile(np.abs(x[1, 1, 500:1000]), 95)
        sig = np.percentile(np.abs(x[1, 1, 1000:1500]), 95)
        assert snrs[1, 1] == pytest.approx(20 * np.log10(sig / noi), abs=0.05)

    def test_snr_no_p_is_nan(self):
        x = np.ones((1, 3, 100))
        snrs, mean = snr_db(jnp.asarray(x), jnp.asarray([np.nan]), jnp.asarray([np.nan]))
        assert np.all(np.isnan(np.asarray(snrs)))


class TestUniformStacking:
    def test_matches_scatter_form(self, rng):
        from volpick_tpu.ops.windows import overlap_stack_uniform

        window, stride, n = 6000, 500, 9
        total = (n - 1) * stride + window
        preds = rng.random((n, 3, window)).astype(np.float32)
        starts = np.arange(n) * stride
        ref = np.asarray(
            overlap_stack(jnp.asarray(preds), jnp.asarray(starts), total, blinding=(500, 500))
        )
        got = np.asarray(overlap_stack_uniform(jnp.asarray(preds), stride, blinding=(500, 500)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_max_stacking(self, rng):
        from volpick_tpu.ops.windows import overlap_stack_uniform

        window, stride, n = 8, 4, 3
        total = (n - 1) * stride + window
        preds = rng.random((n, 1, window)).astype(np.float32)
        starts = np.arange(n) * stride
        ref = np.asarray(overlap_stack(jnp.asarray(preds), jnp.asarray(starts), total, stacking="max"))
        got = np.asarray(overlap_stack_uniform(jnp.asarray(preds), stride, stacking="max"))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_non_divisible_stride_matches_scatter(self, rng):
        # PhaseNet geometry: prime window 3001, stride 501
        from volpick_tpu.ops.windows import overlap_stack_uniform

        window, stride, n = 3001, 501, 7
        total = (n - 1) * stride + window
        preds = rng.random((n, 3, window)).astype(np.float32)
        starts = np.arange(n) * stride
        ref = np.asarray(
            overlap_stack(jnp.asarray(preds), jnp.asarray(starts), total, blinding=(250, 250))
        )
        got = np.asarray(overlap_stack_uniform(jnp.asarray(preds), stride, blinding=(250, 250)))
        np.testing.assert_allclose(got[:, :total], ref, atol=1e-5)

    def test_rejects_bad_stride(self, rng):
        from volpick_tpu.ops.windows import overlap_stack_uniform

        with pytest.raises(ValueError):
            overlap_stack_uniform(jnp.zeros((2, 1, 10)), 0)

    def test_gapped_windows_stride_gt_window(self, rng):
        # negative overlap (gaps between windows): gaps come out as 0
        from volpick_tpu.ops.windows import overlap_stack_uniform

        window, stride, n = 8, 12, 3
        preds = np.ones((n, 1, window), dtype=np.float32)
        starts = np.arange(n) * stride
        total = (n - 1) * stride + window
        ref = np.asarray(overlap_stack(jnp.asarray(preds), jnp.asarray(starts), total))
        got = np.asarray(overlap_stack_uniform(jnp.asarray(preds), stride))
        np.testing.assert_allclose(got[:, :total], ref, atol=1e-6)


class TestFrameWindowsUniform:
    def test_matches_gather_framing(self, rng):
        import jax.numpy as jnp
        from volpick_tpu.ops.windows import frame_windows, frame_windows_uniform

        for (s, c, t, stride, window, n_win) in [
            (2, 3, 1200, 100, 350, 9),
            (1, 3, 6000, 500, 6000, 1),
            (4, 3, 2000, 50, 400, 33),
            (2, 1, 777, 111, 333, 5),   # window not a stride multiple
        ]:
            x = jnp.asarray(rng.normal(size=(s, c, t)).astype(np.float32))
            starts = jnp.arange(n_win, dtype=jnp.int32) * stride
            want = frame_windows(x, starts, window)
            got = frame_windows_uniform(x, n_win, stride, window)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestPerRowThresholds:
    def test_rowwise_equals_per_call(self, rng):
        """One batched call with per-row thresholds == separate scalar calls."""
        import jax.numpy as jnp
        from volpick_tpu.ops.triggers import extract_triggers_batched

        prob = rng.random((6, 3000)).astype(np.float32) ** 3  # sparse peaks
        thr = np.array([0.3, 0.5, 0.7, 0.3, 0.9, 0.4], dtype=np.float32)
        batched = extract_triggers_batched(jnp.asarray(prob), jnp.asarray(thr), max_picks=16)
        for i in range(len(thr)):
            single = extract_triggers_batched(
                jnp.asarray(prob[i : i + 1]), float(thr[i]), max_picks=16
            )
            for a, b in zip(batched, single):
                np.testing.assert_array_equal(np.asarray(a[i]), np.asarray(b[0]))

    def test_fuzz_vs_oracle_batched(self):
        """100 random curves, per-row thresholds, one batched call: triggers,
        peaks, and values all match the numpy obspy-semantics oracle.
        Regression net for the single-scan extractor (the off-index bug class:
        indexing the compacted buffer with itself)."""
        import jax.numpy as jnp
        from volpick_tpu.ops.triggers import (
            extract_triggers_batched,
            picks_from_prob_numpy,
            trigger_onset_numpy,
        )

        rng = np.random.default_rng(0)
        n, b = 3000, 100
        probs = rng.random((b, n)).astype(np.float32) ** rng.integers(1, 6, (b, 1))
        thrs = rng.uniform(0.2, 0.9, b).astype(np.float32)
        res = extract_triggers_batched(jnp.asarray(probs), jnp.asarray(thrs), max_picks=64)
        PK, VAL, VALID, ON, OFF = (np.asarray(a) for a in res)
        for i in range(b):
            want = trigger_onset_numpy(probs[i], thrs[i], thrs[i] / 2)
            got = [(int(o), int(f)) for o, f, v in zip(ON[i], OFF[i], VALID[i]) if v]
            assert got == want[:64]
            wpk, wval = picks_from_prob_numpy(probs[i], float(thrs[i]))
            gpk = [int(x) for x, v in zip(PK[i], VALID[i]) if v]
            assert gpk == list(wpk[:64])

    @pytest.mark.parametrize("method", ["assoc", "shift", "blocked", "pallas", "pallas_full"])
    def test_scan_methods_exact(self, method):
        """Every trigger scan lowering (XLA associative / Hillis-Steele shift /
        two-level blocked / Pallas VMEM kernel, interpret mode on CPU) is
        bit-identical to the numpy oracle — adversarial curves with dense
        runs, plateaus (ties), and boundary-crossing runs at the Pallas
        chunk edge."""
        import jax.numpy as jnp
        from volpick_tpu.ops.triggers import (
            extract_triggers_batched,
            picks_from_prob_numpy,
            trigger_onset_numpy,
        )

        rng = np.random.default_rng(5)
        w = 5000  # crosses the pallas 4096-sample chunk boundary
        dense = rng.uniform(0, 1, (3, w)).astype(np.float32)
        plateau = np.repeat(rng.uniform(0, 1, (3, w // 8 + 1)), 8, axis=1)[:, :w].astype(np.float32)
        edge = np.zeros((2, w), np.float32)
        edge[0, 4090:4102] = 0.8  # run straddling the 4096 chunk edge
        edge[1, :] = 0.9  # run covering the whole curve
        probs = np.concatenate([dense, plateau, edge], axis=0)
        thrs = np.array([0.3, 0.5, 0.7, 0.4, 0.6, 0.2, 0.5, 0.5], np.float32)
        res = extract_triggers_batched(
            jnp.asarray(probs), jnp.asarray(thrs), max_picks=w, method=method
        )
        PK, VAL, VALID, ON, OFF = (np.asarray(a) for a in res)
        for i in range(len(probs)):
            want = trigger_onset_numpy(probs[i], thrs[i], thrs[i] / 2)
            got = [(int(o), int(f)) for o, f, v in zip(ON[i], OFF[i], VALID[i]) if v]
            assert got == want, (method, i)
            wpk, wval = picks_from_prob_numpy(probs[i], float(thrs[i]))
            gpk = PK[i][VALID[i]]
            np.testing.assert_array_equal(gpk, wpk, err_msg=f"{method} row {i}")
            np.testing.assert_allclose(VAL[i][VALID[i]], wval, atol=1e-6)
