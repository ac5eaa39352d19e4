"""Forward-pass parity of the JAX trunks vs the torch oracle with the
published volpick weights (fixed input → max-abs diff), plus shape/param
count checks against the state-dict inventory (SURVEY §2.5)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

WEIGHTS = os.environ.get("VOLPICK_TPU_MODELS", "/root/reference/Final_models/volpick")
PN_PT = os.path.join(WEIGHTS, "phasenet", "volpick.pt.v1")
EQT_PT = os.path.join(WEIGHTS, "eqtransformer", "volpick.pt.v1")

needs_weights = pytest.mark.skipif(
    not os.path.exists(PN_PT), reason="published volpick weights not available"
)


@pytest.fixture(scope="module")
def wave_pn(rng_mod):
    return rng_mod.normal(size=(2, 3, 3001)).astype(np.float32)


@pytest.fixture(scope="module")
def wave_eqt(rng_mod):
    return rng_mod.normal(size=(2, 3, 6000)).astype(np.float32)


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(7)


class TestPhaseNet:
    @needs_weights
    def test_param_count(self):
        from volpick_tpu.models.torch_import import import_phasenet

        params = import_phasenet(PN_PT)
        n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))
        # 269,693 total torch entries = numeric params + 18 num_batches_tracked
        # scalars (BN step counters we do not import).
        assert n == 269_693 - 18

    @needs_weights
    def test_forward_matches_torch_oracle(self, wave_pn):
        import torch
        from torch_oracle import PhaseNetTorch
        from volpick_tpu.models import PhaseNet
        from volpick_tpu.models.torch_import import import_phasenet

        tm = PhaseNetTorch()
        sd = torch.load(PN_PT, map_location="cpu", weights_only=True)
        tm.load_state_dict(sd, strict=True)
        tm.eval()
        with torch.no_grad():
            ref = tm(torch.from_numpy(wave_pn)).numpy()

        model = PhaseNet()
        params = jax.tree_util.tree_map(jnp.asarray, import_phasenet(PN_PT))
        got = np.asarray(model.apply(params, jnp.asarray(wave_pn)))
        assert got.shape == ref.shape == (2, 3, 3001)
        diff = np.abs(got - ref).max()
        assert diff < 2e-5, f"max abs diff {diff}"

    def test_random_init_forward(self):
        from volpick_tpu.models import PhaseNet

        model = PhaseNet()
        params = model.init(jax.random.PRNGKey(0))
        y = model.apply(params, jnp.zeros((1, 3, 3001)))
        assert y.shape == (1, 3, 3001)
        np.testing.assert_allclose(np.asarray(y).sum(1), 1.0, atol=1e-5)

    def test_train_mode_returns_bn_updates(self):
        from volpick_tpu.models import PhaseNet

        model = PhaseNet()
        params = model.init(jax.random.PRNGKey(0))
        y, updates = model.apply(params, jnp.ones((2, 3, 3001)), train=True)
        assert "in_bn" in updates and "mean" in updates["in_bn"]


class TestEQTransformer:
    @needs_weights
    def test_param_count(self):
        from volpick_tpu.models.torch_import import import_eqtransformer

        params = import_eqtransformer(EQT_PT)
        n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))
        # 378,840 total = numeric params + 17 num_batches_tracked scalars
        assert n == 378_840 - 17

    @needs_weights
    def test_forward_matches_torch_oracle(self, wave_eqt):
        import torch
        from torch_oracle import EQTransformerTorch
        from volpick_tpu.models import EQTransformer
        from volpick_tpu.models.torch_import import import_eqtransformer

        tm = EQTransformerTorch()
        sd = torch.load(EQT_PT, map_location="cpu", weights_only=True)
        tm.load_state_dict(sd, strict=True)
        tm.eval()
        with torch.no_grad():
            ref = [t.numpy() for t in tm(torch.from_numpy(wave_eqt))]

        model = EQTransformer()
        params = jax.tree_util.tree_map(jnp.asarray, import_eqtransformer(EQT_PT))
        got = [np.asarray(t) for t in model.apply(params, jnp.asarray(wave_eqt))]
        assert len(got) == 3
        for name, g, r in zip(("det", "P", "S"), got, ref):
            assert g.shape == r.shape == (2, 6000)
            diff = np.abs(g - r).max()
            assert diff < 2e-4, f"{name}: max abs diff {diff}"

    def test_random_init_forward(self):
        from volpick_tpu.models import EQTransformer

        model = EQTransformer()
        params = model.init(jax.random.PRNGKey(0))
        det, p, s = model.apply(params, jnp.zeros((1, 3, 6000)))
        assert det.shape == p.shape == s.shape == (1, 6000)

    def test_fused_inference_matches_reference_program(self):
        """The merged-scan/grouped-conv inference path (the eval default) must
        be numerically the reference per-branch program (float-reassociation
        noise only)."""
        from volpick_tpu.models import EQTransformer
        from volpick_tpu.models.eqtransformer import VolEQTransformer

        for cls in (EQTransformer, VolEQTransformer):
            model = cls()
            params = model.init(jax.random.PRNGKey(3))
            x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 6000))
            ref = model.apply(params, x, fused=False)
            for variant in (True, "lstm", "grouped", "blockdiag",
                            "lstm+grouped", "lstm+blockdiag",
                            "bandattn", "lstm+bandattn",
                            "polyup", "bandattn+polyup",
                            "lstm+grouped+polyup",
                            "plstm", "plstm+bandattn+polyup",
                            "pattn", "plstm+bandattn+pattn"):
                got = model.apply(params, x, fused=variant)
                assert len(ref) == len(got)
                for r, g in zip(ref, got):
                    assert np.abs(np.asarray(r) - np.asarray(g)).max() < 1e-5, variant

    def test_fused_rejected_in_train_mode(self):
        from volpick_tpu.models import EQTransformer

        model = EQTransformer()
        params = model.init(jax.random.PRNGKey(0))
        with pytest.raises(ValueError):
            model.apply(params, jnp.zeros((1, 3, 6000)), train=True, fused=True)

    def test_polyphase_upsample_conv_equality(self):
        """layers.upsample2_conv1d_same == conv1d_same(upsample_nearest(x,2))
        across the decoder's kernel sizes, the crop step, and grouped
        merging (reassociation noise only)."""
        from volpick_tpu.models.layers import (
            conv1d_same,
            upsample2_conv1d_same,
            upsample_nearest,
        )

        rng = np.random.default_rng(7)
        for k in (3, 7, 11):
            for crop in (False, True):
                for groups in (1, 3):
                    x = jnp.asarray(rng.normal(
                        size=(2, 8 * groups, 47)).astype(np.float32))
                    w = jnp.asarray(rng.normal(
                        size=(12 * groups, 8, k)).astype(np.float32))
                    b = jnp.asarray(rng.normal(size=(12 * groups,)).astype(np.float32))
                    u = upsample_nearest(x, 2)
                    if crop:
                        u = u[..., :-1]
                    ref = conv1d_same(u, w, b, groups=groups)
                    got = upsample2_conv1d_same(x, w, b, crop_last=crop, groups=groups)
                    assert got.shape == ref.shape
                    rel = float(jnp.abs(ref - got).max()) / float(jnp.abs(ref).max())
                    assert rel < 1e-5, (k, crop, groups, rel)
        with pytest.raises(ValueError):
            upsample2_conv1d_same(
                jnp.zeros((1, 4, 8)), jnp.zeros((4, 4, 2)))

    def test_stop_after_prefixes(self):
        """stop_after returns each stage's live intermediate at the right
        shape (the --forward-stages probe's contract) and rejects unknown
        stages and train mode."""
        from volpick_tpu.models import EQTransformer

        model = EQTransformer()
        params = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 6000))
        shapes = {
            "encoder": (2, 64, 47),
            "res_cnn": (2, 64, 47),
            "bilstm": (2, 16, 47),
            "transformer": (2, 16, 47),
        }
        for stage, shape in shapes.items():
            assert model.apply(params, x, stop_after=stage).shape == shape
        pick = model.apply(params, x, stop_after="pick")
        assert len(pick) == 3 and all(p.shape == (2, 16, 47) for p in pick)
        with pytest.raises(ValueError):
            model.apply(params, x, stop_after="bogus")
        with pytest.raises(ValueError):
            model.apply(params, x, train=True, stop_after="encoder")

    def test_encoder_length_arithmetic(self):
        from volpick_tpu.models.eqtransformer import (
            _decoder_crops,
            _encoder_pool_paddings,
        )

        pads = _encoder_pool_paddings(6000, 7)
        assert pads == [0, 0, 0, 0, 1, 0, 0]
        # 6000 → 3000 → 1500 → 750 → 375 → 188 → 94 → 47
        crops = _decoder_crops(6000, 7)
        assert crops == [2]
