"""VolEQTransformer (4-head LP/regular detection variant) tests.

Functional realization of the reference's abandoned VolEQTransformerLit /
EventTypeDetectionLabeller design (commented out at
`volpick/model/models.py:909-1557`)."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volpick_tpu.models import EQTransformer, VolEQTransformer


@pytest.fixture(scope="module")
def small_model():
    # small window keeps CPU forward cheap; geometry stays EQT-shaped
    return VolEQTransformer(in_samples=1504, lstm_blocks=1, drop_rate=0.0)


@pytest.fixture(scope="module")
def small_params(small_model):
    return small_model.init(jax.random.PRNGKey(0))


class TestModel:
    def test_four_heads_and_shapes(self, small_model, small_params, rng):
        x = jnp.asarray(rng.normal(size=(2, 3, 1504)).astype(np.float32))
        out = small_model.apply(small_params, x)
        assert len(out) == 4  # (rg_det, lp_det, P, S)
        for o in out:
            assert o.shape == (2, 1504)
            assert float(jnp.min(o)) >= 0.0 and float(jnp.max(o)) <= 1.0

    def test_second_head_is_independent(self, small_model, small_params):
        p = small_params
        assert "decoder_lp" in p and "conv_lp" in p
        # independently initialized, not a copy of the regular head
        w_rg = np.asarray(p["decoder_d"][0]["w"])
        w_lp = np.asarray(p["decoder_lp"][0]["w"])
        assert not np.allclose(w_rg, w_lp)

    def test_param_count_exceeds_eqt_by_lp_branch(self):
        m4 = VolEQTransformer()
        m3 = EQTransformer()
        n4 = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(m4.init(jax.random.PRNGKey(0))))
        n3 = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(m3.init(jax.random.PRNGKey(0))))
        assert n4 > n3
        # delta == one detection decoder + output conv
        p3 = m3.init(jax.random.PRNGKey(0))
        dec = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(p3["decoder_d"]))
        cv = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(p3["conv_d"]))
        assert n4 - n3 == dec + cv

    def test_train_mode_returns_updates(self, small_model, small_params, rng):
        x = jnp.asarray(rng.normal(size=(2, 3, 1504)).astype(np.float32))
        (rg, lp, p, s), upd = small_model.apply(
            small_params, x, train=True, rng=jax.random.PRNGKey(1)
        )
        assert rg.shape == (2, 1504) and len(upd) > 0


class TestLoss:
    def test_event_type_gating(self):
        """LP traces contribute only to the LP head's target and vice versa
        (EventTypeDetectionLabeller: wrong-type labels are zeros)."""
        from volpick_tpu.train.losses import vol_eqt_loss, bce

        b, w = 4, 32
        det = np.zeros((b, w), np.float32)
        det[:, 10:20] = 1.0
        is_lp = np.array([1.0, 0.0, 1.0, 0.0], np.float32)[:, None]
        rg_true = det * (1 - is_lp)
        lp_true = det * is_lp
        # rows 0/2 have zero rg target, rows 1/3 zero lp target
        assert rg_true[0].sum() == 0 and rg_true[1].sum() == 10
        assert lp_true[0].sum() == 10 and lp_true[3].sum() == 0
        pred = jnp.full((b, w), 0.5)
        loss = vol_eqt_loss(pred, pred, pred, pred,
                            jnp.asarray(rg_true), jnp.asarray(lp_true), pred * 0, pred * 0)
        assert float(loss) > 0


class TestTraining:
    def test_smoke_train(self, tmp_path):
        """End-to-end config-driven training with LP/regular gating on the
        synthetic dataset (which carries lp/regular source types)."""
        from volpick_tpu.data.synthetic import make_synthetic_dataset
        from volpick_tpu.train.trainer import train

        make_synthetic_dataset(tmp_path / "ds", n_events=24, n_noise=8, n_samples=2200, seed=3)
        config = {
            "model": "VolEQTransformer",
            "model_args": {
                "lr": 1e-3, "sigma": 20,
                "loss_weights": (0.05, 0.05, 0.45, 0.45),
                "in_samples": 1504, "lstm_blocks": 1, "drop_rate": 0.0,
            },
            "data": str(tmp_path / "ds"),
            "batch_size": 8,
            "trainer_args": {"max_epochs": 1},
            "stack_data": False,
            "save_dir": str(tmp_path / "w"),
        }
        # test_run=False: its batch-size-10 cap does not divide the 8-device
        # test mesh; the dataset is tiny anyway
        result = train(config, experiment_name="voleqt_smoke")
        assert math.isfinite(result["history"][0]["train_loss"])


WEIGHTS = os.environ.get("VOLPICK_TPU_MODELS", "/root/reference/Final_models/volpick")


class TestClassify:
    def test_classify_channels(self, small_model, small_params, rng):
        """classify()/annotate() route the two detection heads correctly."""
        from volpick_tpu.core import Stream, Trace, UTC
        from volpick_tpu.picker import WaveformPicker

        picker = WaveformPicker(small_model, small_params)
        assert picker._prob_channels() == ["Detection_rg", "Detection_lp", "P", "S"]
        data = rng.normal(size=(3, 4000)) * 0.05
        st = Stream([
            Trace(data[i], dict(network="XX", station="V4", channel=f"HH{c}",
                                sampling_rate=100.0, starttime=UTC(0)))
            for i, c in enumerate("ZNE")
        ])
        ann = picker.annotate(st, overlap=800, batch_size=8)
        chans = {tr.stats.channel for tr in ann}
        assert chans == {
            "VolEQTransformer_Detection_rg", "VolEQTransformer_Detection_lp",
            "VolEQTransformer_P", "VolEQTransformer_S",
        }
        out = picker.classify(st, P_threshold=0.95, S_threshold=0.95,
                              detection_threshold=0.95, overlap=800, batch_size=8)
        # untrained net near 0.5 everywhere: no picks above 0.95, no crash
        assert isinstance(len(out.picks), int)


class TestNativeExport:
    def test_export_reload_roundtrip(self, small_model, small_params, tmp_path):
        """Native .json.v1/.npz.v1 export identifies the 4-head architecture
        (the EQT variants share kwargs, so the meta carries it explicitly)."""
        import json

        import jax
        from volpick_tpu.train.model_io import export_pretrained, load_pretrained_npz

        out = export_pretrained(small_model, small_params, tmp_path, name="t")
        meta = json.load(open(out / "t.json.v1"))
        assert meta["architecture"] == "voleqtransformer"
        m2, p2 = load_pretrained_npz(out / "t.json.v1", out / "t.npz.v1")
        assert m2.name == "VolEQTransformer"
        for a, b in zip(jax.tree_util.tree_leaves(small_params), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
