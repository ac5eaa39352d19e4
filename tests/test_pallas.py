"""Pallas conditioning kernel vs the jnp reference (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from volpick_tpu.ops.pallas.conditioning import condition_windows_pallas
from volpick_tpu.ops.signal import demean, detrend_linear, normalize_amplitude


@pytest.mark.parametrize("detrend,norm", [(False, "peak"), (True, "peak"), (False, "std"), (True, "std")])
def test_matches_jnp_reference(rng, detrend, norm):
    x = (rng.normal(size=(8, 3, 1536)) * 7 + np.linspace(0, 3, 1536)).astype(np.float32)
    got = np.asarray(
        condition_windows_pallas(jnp.asarray(x), detrend=detrend, norm=norm, interpret=True)
    )
    ref = detrend_linear(jnp.asarray(x)) if detrend else demean(jnp.asarray(x))
    ref = np.asarray(normalize_amplitude(ref, norm=norm, per_channel=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_tile_mismatch_raises(rng):
    with pytest.raises(ValueError):
        condition_windows_pallas(jnp.zeros((6, 3, 128)), tile=4, interpret=True)


class TestResCNNKernel:
    def _reference(self, params, x):
        """jnp reference: the model's res-CNN section in eval mode."""
        import jax
        from volpick_tpu.models.layers import batch_norm, conv1d_same

        h = x
        for block in params:
            y, _ = batch_norm(h, block["norm1"], eps=1e-3)
            y = jax.nn.relu(y)
            y = conv1d_same(y, block["conv1"]["w"], block["conv1"]["b"])
            y, _ = batch_norm(y, block["norm2"], eps=1e-3)
            y = jax.nn.relu(y)
            y = conv1d_same(y, block["conv2"]["w"], block["conv2"]["b"])
            h = h + y
        return h

    def test_matches_model_rescnn(self, rng):
        import jax
        from volpick_tpu.models import EQTransformer
        from volpick_tpu.ops.pallas.rescnn import fold_res_cnn_params, res_cnn_stack_pallas

        model = EQTransformer()
        params = model.init(jax.random.PRNGKey(2))["res_cnn"]
        # randomize BN stats so folding is actually exercised
        for b in params:
            for nk in ("norm1", "norm2"):
                b[nk]["mean"] = jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.1)
                b[nk]["var"] = jnp.asarray((rng.random(64).astype(np.float32) * 2 + 0.5))
                b[nk]["scale"] = jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.5 + 1)
                b[nk]["bias"] = jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.1)
        x = jnp.asarray(rng.normal(size=(16, 64, 47)), dtype=jnp.float32)
        ref = np.asarray(self._reference(params, x))
        packed = fold_res_cnn_params(params)
        got = np.asarray(res_cnn_stack_pallas(x, packed, tile=16, interpret=True))
        np.testing.assert_allclose(got, ref, atol=3e-4)

    def test_published_weights(self, rng):
        import os
        import pytest as _pytest

        pt = "/root/reference/Final_models/volpick/eqtransformer/volpick.pt.v1"
        if not os.path.exists(pt):
            _pytest.skip("published weights unavailable")
        import jax
        from volpick_tpu.models.torch_import import import_eqtransformer
        from volpick_tpu.ops.pallas.rescnn import fold_res_cnn_params, res_cnn_stack_pallas

        params = jax.tree_util.tree_map(jnp.asarray, import_eqtransformer(pt))["res_cnn"]
        x = jnp.asarray(rng.normal(size=(8, 64, 47)), dtype=jnp.float32)
        ref = np.asarray(self._reference(params, x))
        got = np.asarray(res_cnn_stack_pallas(x, fold_res_cnn_params(params), tile=8, interpret=True))
        np.testing.assert_allclose(got, ref, atol=3e-4)


class TestLSTMKernel:
    """ops/pallas/lstm.py vs layers.lstm_multi (interpreter mode on CPU)."""

    def test_matches_lstm_multi(self, rng):
        from volpick_tpu.models.layers import lstm_multi
        from volpick_tpu.ops.pallas.lstm import lstm_multi_pallas

        for g, b, c, t, h in ((2, 4, 64, 47, 16), (3, 2, 16, 31, 16)):
            xs = jnp.asarray(rng.normal(size=(g, b, c, t)).astype(np.float32))
            w_ih = jnp.asarray(rng.normal(size=(g, 4 * h, c)).astype(np.float32) * 0.2)
            w_hh = jnp.asarray(rng.normal(size=(g, 4 * h, h)).astype(np.float32) * 0.2)
            bias = jnp.asarray(rng.normal(size=(g, 4 * h)).astype(np.float32) * 0.1)
            ref = lstm_multi(xs, w_ih, w_hh, bias)
            got = lstm_multi_pallas(xs, w_ih, w_hh, bias, interpret=True)
            assert got.shape == ref.shape == (g, b, h, t)
            assert float(jnp.abs(ref - got).max()) < 1e-5

    def test_bilstm_pallas_mode(self, rng):
        """bilstm(fused='pallas') equals the unfused reference recurrence."""
        import jax

        from volpick_tpu.models.layers import bilstm

        h = 16
        c = 32
        p = {}
        for suf in ("", "_rev"):
            p[f"w_ih{suf}"] = jnp.asarray(rng.normal(size=(4 * h, c)).astype(np.float32) * 0.2)
            p[f"w_hh{suf}"] = jnp.asarray(rng.normal(size=(4 * h, h)).astype(np.float32) * 0.2)
            p[f"b_ih{suf}"] = jnp.asarray(rng.normal(size=(4 * h,)).astype(np.float32) * 0.1)
            p[f"b_hh{suf}"] = jnp.asarray(rng.normal(size=(4 * h,)).astype(np.float32) * 0.1)
        x = jnp.asarray(rng.normal(size=(3, c, 47)).astype(np.float32))
        assert jax.default_backend() == "cpu"  # "pallas" mode interprets on CPU
        ref = bilstm(x, p, fused=False)
        got = bilstm(x, p, fused="pallas")
        assert float(jnp.abs(ref - got).max()) < 1e-5


class TestAddAttnKernel:
    """ops/pallas/addattn.py vs layers.seq_self_attention (interpreter mode)."""

    def test_matches_dense_reference(self, rng):
        from volpick_tpu.models.layers import seq_self_attention
        from volpick_tpu.ops.pallas.addattn import seq_self_attention_pallas

        b, c, t, u = 3, 16, 47, 32
        x = jnp.asarray(rng.normal(size=(b, c, t)).astype(np.float32))
        p = {
            "Wt": jnp.asarray(rng.normal(size=(c, u)).astype(np.float32) * 0.3),
            "Wx": jnp.asarray(rng.normal(size=(c, u)).astype(np.float32) * 0.3),
            "bh": jnp.asarray(rng.normal(size=(u,)).astype(np.float32) * 0.1),
            "Wa": jnp.asarray(rng.normal(size=(u, 1)).astype(np.float32) * 0.3),
            # nonzero ba exercises the kernel's ba-omission argument: a
            # constant energy shift must cancel exactly under the
            # max-subtracted softmax (addattn.py NOTE)
            "ba": jnp.asarray(np.array([0.7], dtype=np.float32)),
        }
        ref = np.asarray(seq_self_attention(x, p)[0])
        for block_b in (1, 2):  # 2 exercises the B-padding path (b=3)
            got = np.asarray(
                seq_self_attention_pallas(x, p, block_b=block_b, interpret=True)
            )
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_published_weights(self, rng):
        import os

        pt = "/root/reference/Final_models/volpick/eqtransformer/volpick.pt.v1"
        if not os.path.exists(pt):
            pytest.skip("published weights unavailable")
        import jax
        from volpick_tpu.models.layers import seq_self_attention
        from volpick_tpu.models.torch_import import import_eqtransformer
        from volpick_tpu.ops.pallas.addattn import seq_self_attention_pallas

        params = jax.tree_util.tree_map(jnp.asarray, import_eqtransformer(pt))
        x = jnp.asarray(rng.normal(size=(4, 16, 47)).astype(np.float32))
        for blk in ("transformer_d0", "transformer_d"):
            p = params[blk]["attention"]
            ref = np.asarray(seq_self_attention(x, p)[0])
            got = np.asarray(seq_self_attention_pallas(x, p, interpret=True))
            np.testing.assert_allclose(got, ref, atol=1e-5)


class TestMHAKernel:
    """ops/pallas/attention.py vs the jnp softmax-attention (interpreter mode)."""

    def test_matches_xla_attention(self, rng):
        import jax

        from volpick_tpu.ops.pallas.attention import mha_pallas

        b, n_heads, dh, t = 3, 4, 32, 94
        d = n_heads * dh
        q, k, v = (jnp.asarray(rng.normal(size=(b, d, t)).astype(np.float32))
                   for _ in range(3))
        # reference: per-head softmax(qᵀk)v on the same packed layout
        qh = q.reshape(b, n_heads, dh, t)
        kh = k.reshape(b, n_heads, dh, t)
        vh = v.reshape(b, n_heads, dh, t)
        s = jnp.einsum("bhdt,bhds->bhts", qh, kh)
        p = jax.nn.softmax(s, axis=-1)
        ref = jnp.einsum("bhts,bhds->bhdt", p, vh).reshape(b, d, t)
        for block_b in (1, 2):  # 2 exercises the B-padding path (b=3)
            got = mha_pallas(q, k, v, n_heads, block_b=block_b, interpret=True)
            assert got.shape == ref.shape
            assert float(jnp.abs(ref - got).max()) < 1e-5

    def test_tpupicknet_pallas_attn_equals_xla(self, rng):
        import jax

        from volpick_tpu.models.tpupicknet import TPUPickNet

        m = TPUPickNet()
        params = m.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.normal(size=(2, 3, 3008)).astype(np.float32))
        ref = m.apply(params, x, attn="xla")
        got = m.apply(params, x, attn="pallas")
        assert float(jnp.abs(ref - got).max()) < 1e-5
        with pytest.raises(ValueError):
            m.apply(params, x, attn="flash")
