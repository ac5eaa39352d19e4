"""Tests for classical pickers, model I/O (export/load), plotting, QC screen."""

import os

import numpy as np
import jax
import pytest

from volpick_tpu.classical import aic_onset, ar_aic_pick, baer_kradolfer_pick, tune_picker

WEIGHTS = os.environ.get("VOLPICK_TPU_MODELS", "/root/reference/Final_models/volpick")
needs_weights = pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS, "phasenet", "volpick.pt.v1")),
    reason="published volpick weights not available",
)


def synth_onset_trace(rng, n=6000, onset=3000, sr=100.0, snr=8.0):
    t = np.arange(n) / sr
    x = rng.normal(size=n)
    env = np.where(np.arange(n) >= onset, np.exp(-(np.arange(n) - onset) / (2 * sr)), 0.0)
    x = x + np.sin(2 * np.pi * 8 * t + rng.uniform(0, 6)) * env * snr
    return x


class TestAIC:
    def test_aic_onset_clean(self, rng):
        x = np.concatenate([rng.normal(size=500) * 0.1, rng.normal(size=500) * 5.0])
        k = aic_onset(x)
        assert abs(k - 500) < 30

    def test_ar_aic_pick(self, rng):
        z = synth_onset_trace(rng, onset=3000)
        n = synth_onset_trace(rng, onset=3400)
        e = synth_onset_trace(rng, onset=3400)
        p, s = ar_aic_pick(z, n, e, sampling_rate=100.0)
        assert p is not None and abs(p - 3000) < 50
        assert s is not None and abs(s - 3400) < 100

    def test_ar_aic_noise_only(self, rng):
        z = rng.normal(size=6000)
        p, s = ar_aic_pick(z, sampling_rate=100.0)
        # pure white noise: STA/LTA may fire weakly, but commonly None
        assert p is None or 0 <= p < 6000


class TestBaer:
    def test_pick_near_onset(self, rng):
        hits = 0
        for seed in range(5):
            x = synth_onset_trace(np.random.default_rng(seed), onset=3000, snr=10)
            pick, qual = baer_kradolfer_pick(x, 100.0)
            if pick is not None and abs(pick - 3000) < 60:
                hits += 1
        assert hits >= 3, f"only {hits}/5 within tolerance"

    def test_noise_no_pick_mostly(self, rng):
        picks = []
        for seed in range(5):
            x = np.random.default_rng(100 + seed).normal(size=6000)
            pick, _ = baer_kradolfer_pick(x, 100.0)
            picks.append(pick)
        assert sum(p is None for p in picks) >= 3

    def test_tuner(self, rng):
        traces = [synth_onset_trace(np.random.default_rng(s), onset=3000, snr=10) for s in range(4)]
        best = tune_picker(
            baer_kradolfer_pick,
            {"thr1": (5.0, 20.0), "tupevent": (0.3, 1.0)},
            traces,
            [3000] * 4,
            n_trials=8,
        )
        assert best["params"] is not None
        assert 0 <= best["f1"] <= 1
        # both methods run and report per-trial history of equal budget
        rnd = tune_picker(
            baer_kradolfer_pick,
            {"thr1": (5.0, 20.0), "tupevent": (0.3, 1.0)},
            traces,
            [3000] * 4,
            n_trials=8,
            method="random",
        )
        assert len(best["history"]) == len(rnd["history"]) == 8


class TestGPMaximize:
    def test_beats_random_at_equal_budget(self):
        """The GP/EI loop must dominate pure random search at the same trial
        budget on a smooth multimodal objective (the reason gp_minimize exists;
        reference `model_training/tune_pk_baer.py:197-201`). Compared over
        several seeds so the assertion is about the method, not one draw."""
        from volpick_tpu.classical import gp_maximize

        def objective(x, y):
            # inverted Branin (maximization), global max ≈ -0.397887
            a, b, c = 1.0, 5.1 / (4 * np.pi**2), 5.0 / np.pi
            r, s, t = 6.0, 10.0, 1.0 / (8 * np.pi)
            return -(a * (y - b * x**2 + c * x - r) ** 2 + s * (1 - t) * np.cos(x) + s)

        bounds = {"x": (-5.0, 10.0), "y": (0.0, 15.0)}
        gp_wins = 0
        margins = []
        for seed in range(5):
            gp = gp_maximize(objective, bounds, n_trials=30, seed=seed)
            rng = np.random.default_rng(seed)
            rand_best = max(
                objective(rng.uniform(-5, 10), rng.uniform(0, 15)) for _ in range(30)
            )
            margins.append(gp["target"] - rand_best)
            gp_wins += gp["target"] >= rand_best
        assert gp_wins >= 4, f"GP won only {gp_wins}/5 seeds (margins {margins})"
        # and on average it is strictly better
        assert np.mean(margins) > 0

    def test_converges_near_global_optimum(self):
        from volpick_tpu.classical import gp_maximize

        res = gp_maximize(
            lambda x, y: -((x - 0.3) ** 2) - (y + 0.6) ** 2,
            {"x": (-2.0, 2.0), "y": (-2.0, 2.0)},
            n_trials=40,
            seed=1,
        )
        assert res["target"] > -0.01
        assert abs(res["params"]["x"] - 0.3) < 0.1
        assert abs(res["params"]["y"] + 0.6) < 0.1


class TestModelIO:
    def test_export_and_reload_native(self, tmp_path):
        from volpick_tpu.models import PhaseNet, from_pretrained
        from volpick_tpu.train.model_io import export_pretrained

        model = PhaseNet()
        params = model.init(jax.random.PRNGKey(3))
        export_pretrained(model, params, tmp_path, name="mytest",
                          default_args={"P_threshold": 0.5, "S_threshold": 0.4})
        m2, p2 = from_pretrained("phasenet", "mytest", search_paths=[str(tmp_path)])
        assert m2.default_args["P_threshold"] == 0.5
        import jax.numpy as jnp

        x = jnp.ones((1, 3, 3001))
        np.testing.assert_allclose(
            np.asarray(model.apply(params, x)), np.asarray(m2.apply(p2, x)), atol=1e-6
        )

    def test_load_best_model_from_experiment(self, tmp_path):
        from volpick_tpu.data.synthetic import make_synthetic_dataset
        from volpick_tpu.train.trainer import train
        from volpick_tpu.train.model_io import load_best_model

        make_synthetic_dataset(tmp_path / "ds", n_events=12, n_noise=4, n_samples=3500)
        cfg = {
            "model": "PhaseNet",
            "model_args": {"lr": 1e-3},
            "data": str(tmp_path / "ds"),
            "batch_size": 8,
            "trainer_args": {"max_epochs": 1},
            "save_dir": str(tmp_path / "w"),
        }
        train(cfg, experiment_name="io_test")
        model, params = load_best_model(tmp_path / "w" / "io_test", "phasenet")
        import jax.numpy as jnp

        y = model.apply(params, jnp.zeros((1, 3, 3001)))
        assert y.shape == (1, 3, 3001)


class TestPlotting:
    def test_loss_curves(self, tmp_path):
        import pandas as pd

        pd.DataFrame(
            {"epoch": [0, 1], "train_loss": [1.0, 0.8], "val_loss": [1.1, 0.9], "lr": [1e-3, 1e-3]}
        ).to_csv(tmp_path / "metrics.csv", index=False)
        from volpick_tpu.utils.plotting import plot_loss_curves

        fig = plot_loss_curves(tmp_path, save_path=tmp_path / "loss.png")
        assert (tmp_path / "loss.png").exists()

    def test_plot_waveform(self, tmp_path, rng):
        from volpick_tpu.utils.plotting import plot_waveform

        data = rng.normal(size=(3, 2000))
        plot_waveform(data, 100.0, p_sample=800, s_sample=1200,
                      save_path=tmp_path / "w.png")
        assert (tmp_path / "w.png").exists()


@needs_weights
class TestQC:
    def test_screen_flags_events_not_noise(self, rng, tmp_path):
        from volpick_tpu.data.synthetic import make_synthetic_dataset
        from volpick_tpu.data import WaveformDataset
        from volpick_tpu.models import from_pretrained
        from volpick_tpu.picker import WaveformPicker
        from volpick_tpu.utils.qc import screen_dataset_with_models

        make_synthetic_dataset(tmp_path / "ds", n_events=6, n_noise=6, n_samples=4000, seed=21)
        ds = WaveformDataset(tmp_path / "ds")
        picker = WaveformPicker(*from_pretrained("phasenet", search_paths=[WEIGHTS]))
        flags = screen_dataset_with_models(ds, [picker], threshold=0.5, out_dir=tmp_path / "qc")
        from volpick_tpu.pipeline.generator import _onset_arrays

        p, s = _onset_arrays(ds.metadata)
        is_event = ~np.isnan(p)
        # most events should be flagged, most noise should not
        assert flags[is_event].mean() > 0.5
        assert flags[~is_event].mean() < 0.5
        assert (tmp_path / "qc" / "qc_flags.csv").exists()


class TestAnalysisProfiling:
    def test_recall_by_bins(self):
        import pandas as pd
        from volpick_tpu.eval.analysis import recall_by_bins

        targets = pd.DataFrame({"snr": [2.0, 7.0, 12.0, 30.0]})
        truth = [np.array([100.0])] * 4
        picks = [np.array([105.0]), np.array([]), np.array([102.0]), np.array([400.0])]
        df = recall_by_bins(targets, picks, truth, "snr", [0, 5, 10, 20, 60])
        assert df.iloc[0]["recall"] == 1.0   # 2 dB bin: hit
        assert df.iloc[1]["recall"] == 0.0   # 7 dB bin: miss
        assert df.iloc[3]["recall"] == 0.0   # 30 dB: pick 3 s off

    def test_step_timer(self):
        from volpick_tpu.utils.profiling import StepTimer

        t = StepTimer()
        for _ in range(3):
            with t:
                pass
        s = t.summary()
        assert s["steps"] == 3 and s["steps_per_s"] > 0

    def test_trace_summary(self, tmp_path):
        """trace() + summarize_trace() read back an op-level table from the
        profiler's Chrome-format dump (no tensorboard install needed)."""
        import jax.numpy as jnp

        from volpick_tpu.utils.profiling import summarize_trace, trace

        with trace(tmp_path):
            x = jnp.ones((128, 128))
            (x @ x).block_until_ready()
        planes = summarize_trace(tmp_path, top=10)
        assert planes, "no planes parsed"
        rows = next(iter(planes.values()))
        assert rows and {"name", "total_ms", "count", "mean_us"} <= set(rows[0])
        assert all(r["total_ms"] >= rows[-1]["total_ms"] or True for r in rows)
        assert rows == sorted(rows, key=lambda r: -r["total_ms"])

    def test_trainer_restore(self, tmp_path):
        import jax.numpy as jnp
        from volpick_tpu.models import PhaseNet
        from volpick_tpu.train.trainer import Trainer
        from volpick_tpu.train.checkpoints import save_checkpoint

        model = PhaseNet()
        t1 = Trainer(model, lr=1e-3, ema=True)
        t1.step = 42
        state = t1._state(t1.params, t1.opt_state, t1.ema_params, epoch=3)
        save_checkpoint(tmp_path / "c.ckpt", state)
        t2 = Trainer(model, lr=1e-3, ema=True)
        t2.restore(tmp_path / "c.ckpt")
        assert t2.step == 42
        a = jax.tree_util.tree_leaves(t1.params)[0]
        b = jax.tree_util.tree_leaves(t2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_lr_finder(self, tmp_path):
        from volpick_tpu.data.synthetic import make_synthetic_dataset
        from volpick_tpu.data import WaveformDataset
        from volpick_tpu.models import PhaseNet
        from volpick_tpu.pipeline.augmentations import AugmentConfig
        from volpick_tpu.pipeline.generator import TrainGenerator
        from volpick_tpu.train.trainer import Trainer
        from volpick_tpu.train.lr_finder import lr_find

        make_synthetic_dataset(tmp_path / "ds", n_events=16, n_noise=4, n_samples=3500, seed=8)
        ds = WaveformDataset(tmp_path / "ds").get_split("train")
        trainer = Trainer(PhaseNet(), lr=1e-3)
        gen = TrainGenerator(ds, AugmentConfig(window=3001, stack=False), batch_size=8)
        res = lr_find(trainer, gen, num_training=6)
        assert 1e-6 < res["suggestion"] < 1e-1
        assert len(res["losses"]) >= 3

    def test_plot_spectrum(self, tmp_path, rng):
        from volpick_tpu.utils.plotting import plot_spectrum

        plot_spectrum(rng.normal(size=(3, 1000)), 100.0, save_path=tmp_path / "s.png")
        assert (tmp_path / "s.png").exists()


class TestBatchQCPlots:
    def test_table_driven_batches(self, tmp_path, rng):
        """plot_waveforms/plot_spectra/plot_spectrograms: one jpg per row,
        saved under <data_dir>_fig (reference `volpick/data/utils.py:203-573`)."""
        import pandas as pd

        from volpick_tpu.core.stream import Stream, Trace, UTC
        from volpick_tpu.io.miniseed import write_mseed
        from volpick_tpu.utils.plotting import (
            plot_spectra,
            plot_spectrograms,
            plot_waveforms,
        )

        data_dir = tmp_path / "mseed"
        data_dir.mkdir()
        rows = []
        t0 = UTC("2024-03-01T00:00:00")
        for i in range(2):
            st = Stream([
                Trace(rng.normal(size=2000), dict(network="AV", station=f"Q{i}",
                                                  channel=f"BH{c}", sampling_rate=100.0,
                                                  starttime=t0))
                for c in "ZNE"
            ])
            name = f"ev{i}_AV.Q{i}"
            write_mseed(st, data_dir / f"{name}.mseed")
            rows.append({
                "trace_name": name,
                "trace_p_arrival_time": (t0 + 8.0).isoformat(),
                "trace_s_arrival_time": (t0 + 11.0).isoformat(),
            })
        table = pd.DataFrame(rows)
        for fn in (plot_waveforms, plot_spectra, plot_spectrograms):
            paths = fn(table, data_dir, [0, 1], fig_dir=tmp_path / fn.__name__)
            assert len(paths) == 2
            assert all(p.exists() and p.stat().st_size > 0 for p in paths)
        import pytest

        with pytest.raises(KeyError):
            plot_waveforms(table, data_dir, [5])
