"""Augmentation-pipeline tests: window/label geometry, stacking invariants,
gaps, generator batches."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volpick_tpu.pipeline.augmentations import (
    AugmentConfig,
    augment_train_batch,
    gather_window,
    select_window_offsets,
    shift_batch,
    stack_block,
    window_and_label,
    _first_event_end,
)
from volpick_tpu.pipeline.generator import RawBatchSource, TrainGenerator
from volpick_tpu.data.synthetic import make_synthetic_dataset
from volpick_tpu.data import WaveformDataset, VCSEIS


def raw_batch(rng, b=8, c=3, w=9000, with_picks=True):
    x = rng.normal(size=(b, c, w)).astype(np.float32)
    lens = np.full(b, w, np.int32)
    if with_picks:
        p = rng.uniform(2000, 5000, b).astype(np.float32)
        s = p + rng.uniform(100, 600, b).astype(np.float32)
    else:
        p = np.full(b, np.nan, np.float32)
        s = np.full(b, np.nan, np.float32)
    return {"x": jnp.asarray(x), "len": jnp.asarray(lens), "p": jnp.asarray(p), "s": jnp.asarray(s)}


CFG_PN = AugmentConfig(window=3001, stack=False)
CFG_EQT = AugmentConfig(
    window=6000, pre_window=12000, samples_before=6000, noise_column=False, detection=True, detrend=True
)


class TestPrimitives:
    def test_shift_batch(self):
        x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 1, 12))
        r = np.asarray(shift_batch(x, jnp.asarray([3])))
        np.testing.assert_array_equal(r[0, 0, :4], [0, 0, 0, 0])
        np.testing.assert_array_equal(r[0, 0, 4:], np.arange(1, 9))
        l = np.asarray(shift_batch(x, jnp.asarray([-2])))
        np.testing.assert_array_equal(l[0, 0, :10], np.arange(2, 12))
        assert l[0, 0, -1] == 0

    def test_gather_window_pad(self):
        x = jnp.asarray(np.ones((1, 3, 100), np.float32))
        out = np.asarray(gather_window(x, jnp.asarray([100]), jnp.asarray([-10]), 50))
        assert out.shape == (1, 3, 50)
        assert np.all(out[0, :, :10] == 0) and np.all(out[0, :, 10:] == 1)
        out2 = np.asarray(gather_window(x, jnp.asarray([60]), jnp.asarray([40]), 50))
        assert np.all(out2[0, :, :20] == 1) and np.all(out2[0, :, 20:] == 0)

    def test_first_event_end(self):
        cfg = AugmentConfig(sep=200)
        fee, has = _first_event_end(jnp.asarray([1000.0, 1000.0, np.nan]), jnp.asarray([1500.0, np.nan, np.nan]), cfg)
        fee = np.asarray(fee)
        # two onsets: 1500 + max(1.4*500, 200) + 40 = 2240
        assert fee[0] == 2240
        # one onset: 1000 + 1 + 200
        assert fee[1] == 1201
        assert not np.asarray(has)[2]


class TestWindowing:
    def test_offsets_cover_onset(self, rng):
        raw = raw_batch(rng, b=64)
        key = jax.random.PRNGKey(0)
        off = np.asarray(select_window_offsets(key, raw["len"], raw["p"], raw["s"], CFG_PN))
        # windows should often contain the chosen onset; at minimum be in-range-ish
        assert off.min() > -CFG_PN.window
        assert (off < np.asarray(raw["len"])).all()

    def test_window_and_label_shapes(self, rng):
        raw = raw_batch(rng, b=4)
        out = window_and_label(jax.random.PRNGKey(1), raw["x"], raw["len"], raw["p"], raw["s"], CFG_PN)
        assert out["X"].shape == (4, 3, 3001)
        assert out["y"].shape == (4, 3, 3001)
        y = np.asarray(out["y"])
        x = np.asarray(out["X"])
        # normalized per channel
        assert np.abs(x).max() <= 1.0 + 1e-5
        # labels: P+S+N ≈ 1 where no overlap clipping
        np.testing.assert_allclose(y.sum(1).max(), 1.0, atol=1e-5)

    def test_eqt_detections(self, rng):
        raw = raw_batch(rng, b=4, w=15000)
        out = window_and_label(jax.random.PRNGKey(2), raw["x"], raw["len"], raw["p"], raw["s"], CFG_EQT)
        assert out["X"].shape == (4, 3, 6000)
        assert out["y"].shape == (4, 2, 6000)
        assert out["detections"].shape == (4, 1, 6000)

    def test_noise_trace_labels(self, rng):
        raw = raw_batch(rng, b=4, with_picks=False)
        out = window_and_label(jax.random.PRNGKey(3), raw["x"], raw["len"], raw["p"], raw["s"], CFG_PN)
        y = np.asarray(out["y"])
        assert y[:, :2].max() == 0.0
        assert (y[:, 2] == 1.0).all()


class TestStacking:
    def test_full_program_runs_and_is_deterministic(self, rng):
        cfg = AugmentConfig(window=3001, stack=True)
        prim = raw_batch(rng, b=16)
        sec = raw_batch(rng, b=16)
        sec2 = raw_batch(rng, b=16)
        noi = raw_batch(rng, b=16, with_picks=False)
        noi2 = raw_batch(rng, b=16, with_picks=False)
        key = jax.random.PRNGKey(7)
        out1 = augment_train_batch(key, prim, sec, sec2, noi, noi2, cfg)
        out2 = augment_train_batch(key, prim, sec, sec2, noi, noi2, cfg)
        np.testing.assert_array_equal(np.asarray(out1["X"]), np.asarray(out2["X"]))
        x, y = np.asarray(out1["X"]), np.asarray(out1["y"])
        assert x.shape == (16, 3, 3001) and y.shape == (16, 3, 3001)
        assert np.isfinite(x).all() and np.isfinite(y).all()
        assert np.abs(x).max() <= 1.0 + 1e-5  # final re-normalization
        assert (y >= 0).all() and (y <= 1 + 1e-5).all()

    def test_labels_stay_valid_distribution(self, rng):
        cfg = AugmentConfig(window=3001, stack=True)
        prim = raw_batch(rng, b=32)
        out = augment_train_batch(
            jax.random.PRNGKey(9),
            prim,
            raw_batch(rng, b=32),
            raw_batch(rng, b=32),
            raw_batch(rng, b=32, with_picks=False),
            raw_batch(rng, b=32, with_picks=False),
            cfg,
        )
        y = np.asarray(out["y"])
        sums = y.sum(1)
        # after method1 renormalization, P+S+N == 1 wherever stacking happened;
        # un-stacked samples keep clip semantics (sum <= 1 + eps from labeller)
        assert sums.max() <= 1.0 + 1e-4

    def test_stack_produces_second_event_sometimes(self, rng):
        # with stacking forced on (p=[1,0,0]) the P label should show two bumps
        cfg = AugmentConfig(window=3001, stack=True, p_event_modes=(1.0, 0.0, 0.0), p_two_events=0.0)
        prim = raw_batch(rng, b=32)
        sec = raw_batch(rng, b=32)
        out = augment_train_batch(
            jax.random.PRNGKey(11), prim, sec, sec,
            raw_batch(rng, b=32, with_picks=False), raw_batch(rng, b=32, with_picks=False), cfg,
        )
        y = np.asarray(out["y"])
        # count samples whose P row has two separated peaks > 0.9
        two = 0
        for i in range(32):
            peaks = np.where(y[i, 0] > 0.9)[0]
            if len(peaks) and peaks.max() - peaks.min() > 100:
                two += 1
        assert two >= 5, f"only {two} stacked second events"

    def test_gap_sets_noise_one(self, rng):
        cfg = AugmentConfig(window=3001, stack=False, gap_prob=1.0)
        prim = raw_batch(rng, b=8)
        out = augment_train_batch(jax.random.PRNGKey(5), prim, None, None, None, None, cfg)
        x, y = np.asarray(out["X"]), np.asarray(out["y"])
        # wherever x is exactly zero across channels in a contiguous span, noise==1
        for i in range(8):
            gap = np.all(x[i] == 0, axis=0)
            if gap.any():
                assert np.allclose(y[i, 2][gap], 1.0)


class TestGenerator:
    def test_epoch_batches(self, tmp_path, rng):
        make_synthetic_dataset(tmp_path, n_events=24, n_noise=8, n_samples=4000, seed=3)
        ds = VCSEIS(tmp_path)
        train = ds.get_split("train")
        cfg = AugmentConfig(window=3001, stack=True)
        gen = TrainGenerator(
            train,
            cfg,
            batch_size=8,
            eq_dataset=ds.get_regular_earthquakes().filter(
                ds.get_regular_earthquakes().metadata["split"] == "train", inplace=False
            ),
            noise_dataset=ds.get_noise_traces().filter(
                ds.get_noise_traces().metadata["split"] == "train", inplace=False
            ),
        )
        batches = list(gen.epoch())
        assert len(batches) == len(gen)
        b0 = batches[0]
        assert b0["X"].shape == (8, 3, 3001)
        assert np.isfinite(np.asarray(b0["X"])).all()

    def test_host_window_crop_geometry(self, rng):
        """Host crop == device gather_window at the same offsets; onsets
        shift into window coordinates; out-of-trace samples are zero."""
        from volpick_tpu.pipeline.generator import host_window_crop

        b, c, w_raw = 16, 3, 9000
        x = rng.normal(size=(b, c, w_raw)).astype(np.float32)
        lens = np.full(b, w_raw, np.int32)
        lens[3] = 4000  # short trace: window may overrun into zero pad
        x[3, :, 4000:] = 7.7  # garbage beyond len must never appear
        p = rng.uniform(2000, 3500, b).astype(np.float32)
        s = p + rng.uniform(100, 600, b).astype(np.float32)
        p[5] = np.nan
        s[5] = np.nan  # noise trace
        cfg = AugmentConfig(window=3001)
        out = host_window_crop(np.random.default_rng(0), {"x": x, "len": lens, "p": p, "s": s}, cfg)
        assert out["x"].shape == (b, c, 3001)
        assert (out["len"] == 3001).all()
        assert not np.any(out["x"] == 7.7)
        # each cropped row is a contiguous slice of the raw trace (find the
        # implied offset from the adjusted onset and compare content)
        for i in range(b):
            if np.isnan(p[i]):
                continue
            off = int(round(p[i] - out["p"][i]))
            assert np.isclose(s[i] - off, out["s"][i], atol=1e-3)
            lo, hi = max(off, 0), min(off + 3001, int(lens[i]))
            if hi > lo:
                np.testing.assert_array_equal(out["x"][i, :, lo - off : hi - off], x[i, :, lo:hi])

    def test_device_gather_crop_matches_host_crop(self, rng):
        """device_gather_crop (HBM-resident pool) is bit-identical to
        host_window_crop's numpy crop at the same offsets."""
        from volpick_tpu.pipeline.generator import (
            device_gather_crop,
            host_window_crop,
            select_window_offsets_host,
        )

        b, c, w_raw = 12, 3, 9000
        x = rng.normal(size=(b, c, w_raw)).astype(np.float32)
        lens = np.full(b, w_raw, np.int32)
        lens[2] = 3500
        p = rng.uniform(1000, 4000, b).astype(np.float32)
        s = p + 300
        p[4] = np.nan
        s[4] = np.nan
        cfg = AugmentConfig(window=3001)
        host = host_window_crop(
            np.random.default_rng(7), {"x": x, "len": lens, "p": p, "s": s}, cfg
        )
        off = select_window_offsets_host(np.random.default_rng(7), lens, p, s, cfg)
        idx = np.arange(b, dtype=np.int32)
        dev = device_gather_crop(
            jnp.asarray(x), idx, off.astype(np.int32), lens.astype(np.int32), cfg.window
        )
        np.testing.assert_array_equal(np.asarray(dev), host["x"])

    def test_device_data_mode_reproduces_host_mode(self, tmp_path, rng):
        """The device-resident generator realizes the SAME training stream as
        the host-crop path from one seed (identical RNG draw order), with
        stacking on so all five per-step sources are exercised."""
        make_synthetic_dataset(tmp_path, n_events=24, n_noise=8, n_samples=4000, seed=9)
        ds = VCSEIS(tmp_path)
        train = ds.get_split("train")
        eq = ds.get_regular_earthquakes().filter(
            ds.get_regular_earthquakes().metadata["split"] == "train", inplace=False
        )
        noise = ds.get_noise_traces().filter(
            ds.get_noise_traces().metadata["split"] == "train", inplace=False
        )
        cfg = AugmentConfig(window=3001, stack=True)

        def batches(device_data):
            gen = TrainGenerator(
                train, cfg, batch_size=8, eq_dataset=eq, noise_dataset=noise,
                seed=17, drop_last=False, device_data=device_data,
            )
            assert gen.device_data == device_data
            return [
                {k: np.asarray(v) for k, v in b.items()} for b in gen.epoch()
            ]

        host_b, dev_b = batches(False), batches(True)
        assert len(host_b) == len(dev_b) > 0
        for hb, db in zip(host_b, dev_b):
            assert set(hb) == set(db)
            for k in hb:
                np.testing.assert_array_equal(hb[k], db[k], err_msg=k)

    def test_device_data_auto_resolution(self, tmp_path, rng):
        """Auto mode turns device pools on for small preloaded sources and
        off when the pools exceed the budget."""
        make_synthetic_dataset(tmp_path, n_events=12, n_noise=4, n_samples=4000, seed=2)
        ds = VCSEIS(tmp_path)
        train = ds.get_split("train")
        cfg = AugmentConfig(window=3001, stack=False)
        assert TrainGenerator(train, cfg, batch_size=4).device_data is True
        assert TrainGenerator(train, cfg, batch_size=4,
                              device_pool_budget=1).device_data is False

    def test_host_window_matches_device_distribution(self, tmp_path, rng):
        """host_window=True feeds the same augmentation program: output
        geometry identical, and the P-label peak rate (fraction of windows
        that contain their pick) statistically matches host_window=False."""
        make_synthetic_dataset(tmp_path, n_events=40, n_noise=8, n_samples=6000, seed=5)
        ds = VCSEIS(tmp_path)
        train = ds.get_split("train")
        cfg = AugmentConfig(window=3001, stack=False)

        def peak_rate(host_window):
            gen = TrainGenerator(train, cfg, batch_size=8, seed=11, host_window=host_window)
            rates = []
            for _ in range(3):
                for batch in gen.epoch():
                    y = np.asarray(batch["y"])
                    assert batch["X"].shape == (8, 3, 3001)
                    rates.append((y[:, 0].max(axis=-1) > 0.95).mean())
            return np.mean(rates)

        r_host, r_dev = peak_rate(True), peak_rate(False)
        assert abs(r_host - r_dev) < 0.25  # same window program, different RNG stream


class TestRotation:
    def test_rotation_preserves_content(self, rng):
        import jax
        from volpick_tpu.pipeline.augmentations import AugmentConfig, rotation_block

        cfg = AugmentConfig(window=3001, rotate_array=True, rotate_prob=1.0)
        x = rng.normal(size=(4, 3, 3001)).astype(np.float32)
        y = rng.random((4, 3, 3001)).astype(np.float32)
        out = rotation_block(jax.random.PRNGKey(0), {"X": jnp.asarray(x), "y": jnp.asarray(y)}, cfg)
        xr = np.asarray(out["X"])
        # rotation is a permutation: multiset of values preserved per channel
        np.testing.assert_allclose(np.sort(xr[0, 0]), np.sort(x[0, 0]), atol=1e-6)
        assert not np.allclose(xr, x)  # actually rotated

    def test_rotation_in_program(self, rng):
        import jax
        from volpick_tpu.pipeline.augmentations import AugmentConfig, augment_train_batch

        cfg = AugmentConfig(window=3001, stack=False, rotate_array=True)
        prim = raw_batch(rng, b=4)
        out = augment_train_batch(jax.random.PRNGKey(1), prim, None, None, None, None, cfg)
        assert np.isfinite(np.asarray(out["X"])).all()


class TestSuperimposeMechanics:
    """Exact verification of the superimpose math: with a placement range of
    width 1 the random shift is deterministic, so the output is checkable
    sample-for-sample (the scale is recovered from the zeroed tail)."""

    def test_deterministic_placement(self, rng):
        from volpick_tpu.pipeline.augmentations import AugmentConfig, stack_block
        from volpick_tpu.ops.labels import probabilistic_labels

        sep = 200
        # fee = S + max(1.4*(S-P), sep) + 0.2*sep with P=1000, S=1200 → 1520
        p1, s1 = 1000.0, 1200.0
        fee = int(s1 + max(1.4 * (s1 - p1), sep) + 0.2 * sep)
        n = fee + 2 * sep + 1  # placement range [fee, n-2sep) has width 1
        cfg = AugmentConfig(
            window=n, stack=True, sep=sep,
            p_event_modes=(1.0, 0.0, 0.0), p_two_events=0.0,
            p_noise_modes=(0.0, 0.0, 1.0),
        )
        b = 4
        x1 = rng.normal(size=(b, 3, n)).astype(np.float32)
        y1 = np.asarray(probabilistic_labels(
            jnp.asarray(np.tile([[p1, s1]], (b, 1))), n, sigma=20))
        op = 500.0  # secondary P position
        x2 = rng.normal(size=(b, 3, n)).astype(np.float32)
        y2 = np.asarray(probabilistic_labels(
            jnp.asarray(np.tile([[op, op + 150.0]], (b, 1))), n, sigma=20))
        prim = {"X": jnp.asarray(x1), "y": jnp.asarray(y1),
                "p": jnp.asarray([p1] * b), "s": jnp.asarray([s1] * b)}
        sec = {"X": jnp.asarray(x2), "y": jnp.asarray(y2)}
        zero = {"X": jnp.zeros_like(prim["X"]), "y": jnp.zeros_like(prim["y"])}
        out = stack_block(jax.random.PRNGKey(3), prim, sec, sec,
                          jnp.zeros((b, 3, n)), jnp.zeros((b, 3, n)), cfg)
        xo, yo = np.asarray(out["X"]), np.asarray(out["y"])

        shift = fee - int(op)  # deterministic: shifted_pick == fee
        for i in range(b):
            # expected secondary: zero before op-sep, then shifted right
            x2i = x2[i].copy()
            x2i[:, : int(op) - sep] = 0.0
            x2s = np.zeros_like(x2i)
            x2s[:, shift:] = x2i[:, :-shift]
            # primary tail zeroed at fee
            x1z = x1[i].copy()
            x1z[:, fee:] = 0.0
            # recover scale from a region where the primary is zero
            probe = slice(fee + 50, fee + 60)
            ratio = xo[i, 0, probe] / x2s[0, probe]
            scale = float(np.median(ratio))
            assert 0.25 - 1e-3 <= scale <= 4.0 + 1e-3, scale
            np.testing.assert_allclose(xo[i], x1z + scale * x2s, rtol=2e-3, atol=1e-4)
            # labels: max-merge then method1 renormalization
            y2s = np.zeros_like(y2[i])
            y2s[:, shift:] = y2[i][:, :-shift]
            ym = np.maximum(y1[i], y2s)
            phases = ym[:2] / np.maximum(1.0, ym[:2].sum(0, keepdims=True))
            noise = 1.0 - phases.sum(0)
            np.testing.assert_allclose(yo[i, :2], phases, atol=1e-5)
            np.testing.assert_allclose(yo[i, 2], noise, atol=1e-5)
            # the placed secondary P peak sits exactly at fee
            assert abs(int(np.argmax(yo[i, 0][1300:])) + 1300 - fee) <= 1

    def test_duplicate_mechanics(self, rng):
        """Duplicate-self: recover the drawn shift from the placed P peak,
        then verify the waveform/label math sample-for-sample."""
        from volpick_tpu.pipeline.augmentations import AugmentConfig, stack_block
        from volpick_tpu.ops.labels import probabilistic_labels

        sep = 200
        p1, s1 = 1000.0, 1200.0
        fee = int(s1 + max(1.4 * (s1 - p1), sep) + 0.2 * sep)
        n = fee + 3 * sep  # feasible (fee < n-2sep); placement in [fee, n-sep)
        cfg = AugmentConfig(
            window=n, stack=True, sep=sep,
            p_event_modes=(0.0, 1.0, 0.0), p_two_events=0.0,
            p_noise_modes=(0.0, 0.0, 1.0),
        )
        b = 3
        x1 = rng.normal(size=(b, 3, n)).astype(np.float32)
        y1 = np.asarray(probabilistic_labels(
            jnp.asarray(np.tile([[p1, s1]], (b, 1))), n, sigma=20))
        prim = {"X": jnp.asarray(x1), "y": jnp.asarray(y1),
                "p": jnp.asarray([p1] * b), "s": jnp.asarray([s1] * b)}
        dummy = {"X": jnp.zeros_like(prim["X"]), "y": jnp.zeros_like(prim["y"])}
        out = stack_block(jax.random.PRNGKey(11), prim, dummy, dummy,
                          jnp.zeros((b, 3, n)), jnp.zeros((b, 3, n)), cfg)
        xo, yo = np.asarray(out["X"]), np.asarray(out["y"])
        for i in range(b):
            # placed P peak = argmax of the P label after the original event
            placed = int(np.argmax(yo[i, 0][1400:])) + 1400
            assert fee <= placed < n - sep
            shift = placed - int(p1)
            # duplicate secondary = pre-zero copy, zeroed before p1 - sep
            x2i = x1[i].copy()
            x2i[:, : int(p1) - sep] = 0.0
            x2s = np.zeros_like(x2i)
            x2s[:, shift:] = x2i[:, :-shift]
            x1z = x1[i].copy()
            x1z[:, fee:] = 0.0
            probe = slice(placed + 50, placed + 60)
            scale = float(np.median(xo[i, 0, probe] / x2s[0, probe]))
            assert 0.25 - 1e-3 <= scale <= 4.0 + 1e-3
            np.testing.assert_allclose(xo[i], x1z + scale * x2s, rtol=2e-3, atol=1e-4)


class TestLazySource:
    def test_lazy_matches_preloaded(self, tmp_path, rng):
        from volpick_tpu.pipeline.generator import RawBatchSource

        make_synthetic_dataset(tmp_path, n_events=10, n_noise=2, n_samples=3000, seed=6)
        ds = WaveformDataset(tmp_path)
        pre = RawBatchSource(ds, preload=True)
        lazy = RawBatchSource(ds, preload=False)
        assert not lazy.preloaded and pre.preloaded
        idx = np.array([0, 3, 7])
        a, b = pre.take(idx), lazy.take(idx)
        np.testing.assert_allclose(a["x"], b["x"], atol=1e-6)
        np.testing.assert_array_equal(a["len"], b["len"])
        np.testing.assert_allclose(a["p"], b["p"], equal_nan=True)

    def test_dataset_smaller_than_batch_still_trains(self, tmp_path, rng):
        """n_traces < batch_size with drop_last=True must yield ONE padded
        batch, not zero steps — zero steps made train_loss nan and froze the
        lr schedule while val kept evaluating (found by the fine-bucket
        diffsize 5% leg: 155 traces, batch 256)."""
        from volpick_tpu.pipeline.augmentations import AugmentConfig
        from volpick_tpu.pipeline.generator import TrainGenerator

        make_synthetic_dataset(tmp_path / "d", n_events=10, n_noise=2, n_samples=3500, seed=3)
        ds = WaveformDataset(tmp_path / "d").get_split("train")
        gen = TrainGenerator(ds, AugmentConfig(window=3001, stack=False),
                             batch_size=64, drop_last=True)
        assert len(gen) == 1
        batches = list(gen.epoch())
        assert len(batches) == 1
        X = np.asarray(batches[0]["X"])
        assert X.shape[0] == 64 and np.isfinite(X).all()

    def test_lazy_generator_trains(self, tmp_path, rng):
        import jax
        from volpick_tpu.pipeline.augmentations import AugmentConfig
        from volpick_tpu.pipeline.generator import RawBatchSource, TrainGenerator

        make_synthetic_dataset(tmp_path / "d", n_events=16, n_noise=4, n_samples=3500, seed=7)
        ds = WaveformDataset(tmp_path / "d").get_split("train")
        gen = TrainGenerator(ds, AugmentConfig(window=3001, stack=False), batch_size=4)
        gen.primary = RawBatchSource(ds, preload=False)  # force lazy
        batches = list(gen.epoch())
        assert len(batches) == len(gen)
        assert np.isfinite(np.asarray(batches[0]["X"])).all()
