"""TPUPickNet: shape/probability invariants, trainability, classify integration."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volpick_tpu.models import TPUPickNet


class TestForward:
    def test_shapes_and_softmax(self, rng):
        model = TPUPickNet(n_layers=2)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.normal(size=(2, 3, 3008)), dtype=jnp.float32)
        y = model.apply(params, x)
        assert y.shape == (2, 3, 3008)
        np.testing.assert_allclose(np.asarray(y).sum(1), 1.0, atol=1e-5)

    def test_param_count_mxu_shaped(self):
        model = TPUPickNet()
        params = model.init(jax.random.PRNGKey(0))
        n = sum(np.asarray(a).size for a in jax.tree_util.tree_leaves(params))
        assert 800_000 < n < 4_000_000
        # attention matmuls are full MXU width
        assert params["blocks"][0]["qkv"]["w"].shape == (128, 384)

    def test_train_mode(self, rng):
        model = TPUPickNet(n_layers=1)
        params = model.init(jax.random.PRNGKey(0))
        y, updates = model.apply(params, jnp.zeros((1, 3, 3008)), train=True)
        assert updates == {}

    def test_bf16_forward_stays_bf16(self, rng):
        """Regression: a np.float64 attention scale silently promoted the
        whole transformer to float32, breaking bf16 inference (conv dtype
        mismatch at the decoder). bf16 params + bf16 input must run
        end-to-end in bf16 and land near the fp32 probabilities."""
        model = TPUPickNet(n_layers=2)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.normal(size=(2, 3, 3008)), dtype=jnp.float32)
        y32 = model.apply(params, x)
        p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
        y16 = model.apply(p16, x.astype(jnp.bfloat16))
        assert y16.dtype == jnp.bfloat16
        assert float(jnp.max(jnp.abs(y32 - y16.astype(jnp.float32)))) < 0.05


class TestTraining:
    def test_learns_on_synthetic(self, tmp_path):
        from volpick_tpu.data.synthetic import make_synthetic_dataset
        from volpick_tpu.train.trainer import train

        make_synthetic_dataset(tmp_path / "ds", n_events=24, n_noise=8, n_samples=4096, seed=4)
        cfg = {
            "model": "TPUPickNet",
            "model_args": {"lr": 1e-3, "sigma": 20, "n_layers": 1},
            "data": str(tmp_path / "ds"),
            "batch_size": 8,
            "trainer_args": {"max_epochs": 3},
            "warmup_steps": 3,
            "save_dir": str(tmp_path / "w"),
        }
        res = train(cfg, experiment_name="tpn")
        h = res["history"]
        assert all(math.isfinite(e["train_loss"]) for e in h)
        assert h[-1]["train_loss"] < h[0]["train_loss"]

    def test_export_reload(self, tmp_path):
        from volpick_tpu.models import from_pretrained
        from volpick_tpu.train.model_io import export_pretrained

        model = TPUPickNet(n_layers=1)
        params = model.init(jax.random.PRNGKey(1))
        export_pretrained(model, params, tmp_path, name="t1",
                          default_args={"P_threshold": 0.3, "S_threshold": 0.3})
        m2, p2 = from_pretrained("tpupicknet", "t1", search_paths=[str(tmp_path)])
        assert m2.name == "TPUPickNet" and m2.n_layers == 1
        x = jnp.ones((1, 3, 3008))
        np.testing.assert_allclose(
            np.asarray(model.apply(params, x)), np.asarray(m2.apply(p2, x)), atol=1e-6
        )


class TestClassify:
    def test_classify_integration(self, rng):
        """Untrained net won't pick, but the full classify path must run."""
        from volpick_tpu.core import Stream, Trace, UTC
        from volpick_tpu.picker import WaveformPicker

        model = TPUPickNet(n_layers=1)
        params = model.init(jax.random.PRNGKey(0))
        picker = WaveformPicker(model, params)
        data = rng.normal(size=(3, 9000)).astype(np.float32)
        st = Stream(
            [Trace(data[i], dict(network="XX", station="TPN", channel=f"HH{c}",
                                 sampling_rate=100.0, starttime=UTC(0)))
             for i, c in enumerate("ZNE")]
        )
        out = picker.classify(st, P_threshold=0.9, S_threshold=0.9, overlap=1504)
        assert out.creator == "TPUPickNet"
