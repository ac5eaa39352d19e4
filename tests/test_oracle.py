"""Property tests: the fused device classify()/annotate() path must match the
host-side numpy oracle of SeisBench's annotate/classify algorithm
(volpick_tpu/picker/oracle.py) sample-exactly for arbitrary stream lengths —
including the final flush window at the stream end (reference
`README.md:54-62`). Three-way agreement is asserted:

    classify_arrays picks == oracle picks == picks from annotate_array curves
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volpick_tpu.ops.triggers import picks_from_prob_numpy
from volpick_tpu.picker.annotate import WaveformPicker
from volpick_tpu.picker.oracle import oracle_annotate, oracle_classify

WINDOW = 400


class DummyNet:
    """Tiny deterministic stand-in model: probability curves from smoothed
    channel energy, steep sigmoids so float32-vs-float64 rounding cannot move
    a threshold crossing. Lets the placement/stacking/trigger algebra be
    pinned across dozens of stream lengths without real weights."""

    name = "DummyNet"
    in_samples = WINDOW
    phases = "PSN"
    norm = "peak"
    sampling_rate = 100.0
    component_order = "ZNE"
    default_args = {"P_threshold": 0.5, "S_threshold": 0.5}

    # gain/offset chosen so probabilities stay in (0.05, 0.999): a saturated
    # sigmoid would plateau at exactly 1.0 in float32 and argmax tie-breaking
    # would diverge from the float64 oracle
    @staticmethod
    def apply(params, frames):  # (N, C, W) -> (N, 3, W)
        kern = jnp.ones(31) / 31.0
        sm = lambda x: jax.vmap(lambda r: jnp.convolve(r, kern, mode="same"))(x)
        p = jax.nn.sigmoid((sm(jnp.abs(frames[:, 0, :])) * 3.0 - 1.0) * 3.0)
        s = jax.nn.sigmoid((sm(jnp.abs(frames[:, 1, :])) * 3.0 - 1.0) * 3.0)
        n = 1.0 - jnp.maximum(p, s)
        return jnp.stack([p, s, n], axis=1)

    @staticmethod
    def predict_np(frame):  # numpy mirror of apply for the oracle, (C, W) -> (3, W)
        kern = np.ones(31) / 31.0
        sm = lambda r: np.convolve(r, kern, mode="same")
        sig = lambda x: 1.0 / (1.0 + np.exp(-x))
        p = sig((sm(np.abs(frame[0])) * 3.0 - 1.0) * 3.0)
        s = sig((sm(np.abs(frame[1])) * 3.0 - 1.0) * 3.0)
        n = 1.0 - np.maximum(p, s)
        return np.stack([p, s, n])


def make_data(rng, total):
    """Noise plus a few bursts so curves cross the 0.5 threshold cleanly."""
    data = rng.normal(size=(3, total)) * 0.05
    for at in range(total // 4, total, max(total // 3, 50)):
        n = min(60, total - at)
        data[0, at : at + n] += np.hanning(n) * 1.2
        if at + 30 + n <= total:
            data[1, at + 30 : at + 30 + n] += np.hanning(n) * 1.4
    return data.astype(np.float64)


THRESHOLDS = {"P": 0.5, "S": 0.5, "N": 2.0}


def run_all_three(data, overlap, blinding=(0, 0), stacking="avg"):
    picker = WaveformPicker(DummyNet(), {}, detrend=False)
    dev = picker.classify_arrays(
        data[None], THRESHOLDS, overlap=overlap, blinding=blinding, stacking=stacking,
        batch_size=8,
    )
    orc = oracle_classify(
        data, DummyNet.predict_np, WINDOW, overlap, THRESHOLDS,
        channels=list("PSN"), blinding=blinding, stacking=stacking,
        detrend=False, norm="peak",
    )
    curves = picker.annotate_array(
        data[None], overlap=overlap, blinding=blinding, stacking=stacking, batch_size=8
    )[0]
    return dev, orc, curves


def check_match(data, overlap, blinding=(0, 0), stacking="avg"):
    total = data.shape[-1]
    dev, orc, curves = run_all_three(data, overlap, blinding, stacking)

    # oracle curves == annotate_array curves (same window set + stacking)
    ocurves = oracle_annotate(
        data, DummyNet.predict_np, WINDOW, overlap, blinding=blinding,
        stacking=stacking, detrend=False, norm="peak",
    )
    np.testing.assert_allclose(curves, ocurves, atol=2e-5)

    for label in ("P", "S"):
        pk, val, valid, on, off = (a[0] for a in dev[label])
        got = [
            (int(p), int(o)) for p, o, v in zip(pk, on, valid)
            if v and o < total and p < total
        ]
        want = [(t[0], t[2]) for t in orc[label]]
        assert got == want, (
            f"{label} classify≠oracle at total={total} overlap={overlap} "
            f"blinding={blinding}: {got} vs {want}"
        )
        # picks recomputed from the annotate curves agree too
        apk, _ = picks_from_prob_numpy(curves[list("PSN").index(label)], 0.5)
        assert [g[0] for g in got] == [int(x) for x in apk if x < total]


class TestFlushWindowParity:
    @pytest.mark.parametrize("total", [150, 399, 400, 401, 555, 799, 800, 801, 1234, 2000])
    def test_random_lengths(self, total):
        rng = np.random.default_rng(total)
        check_match(make_data(rng, total), overlap=100)

    @pytest.mark.parametrize("overlap", [50, 100, 250, 300, 370])
    def test_overlaps(self, overlap):
        rng = np.random.default_rng(overlap)
        check_match(make_data(rng, 1111), overlap=overlap)

    def test_blinding_with_flush(self):
        rng = np.random.default_rng(7)
        check_match(make_data(rng, 987), overlap=200, blinding=(50, 50))

    def test_max_stacking_with_flush(self):
        rng = np.random.default_rng(8)
        check_match(make_data(rng, 1033), overlap=150, stacking="max")

    def test_tiny_stride_scatter_fallback(self):
        # stride 5 → ceil(window/stride)=80 > 64: exercises the general
        # scatter overlap_stack path with the flush window in `starts`
        rng = np.random.default_rng(9)
        check_match(make_data(rng, 640), overlap=WINDOW - 5)

    def test_exact_tiling_has_no_flush(self):
        # (total - window) divisible by stride → no flush window; the
        # uniform fast path alone must already match the oracle
        rng = np.random.default_rng(10)
        check_match(make_data(rng, WINDOW + 5 * 100, ), overlap=300)  # stride 100

    def test_short_stream_picks_clamped(self):
        # stream shorter than one window: picks in the zero-padded tail of
        # the single window must be dropped by the boundary rules
        rng = np.random.default_rng(11)
        data = rng.normal(size=(3, 120)) * 0.05
        data[0, 100:120] += np.hanning(20) * 5.0  # burst at the very end
        check_match(data, overlap=100)


WEIGHTS = os.environ.get("VOLPICK_TPU_MODELS", "/root/reference/Final_models/volpick")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS, "phasenet", "volpick.pt.v1")),
    reason="published volpick weights not available",
)
class TestFlushWindowRealModel:
    def test_phasenet_tail_matches_oracle(self, rng):
        """Real PhaseNet, stream length chosen so a flush window is needed."""
        from volpick_tpu.models import from_pretrained

        model, params = from_pretrained("phasenet", search_paths=[WEIGHTS])
        picker = WaveformPicker(model, params)
        total = 9350  # (9350-3001) % 501 != 0 → flush window
        t = np.arange(total) / 100.0
        data = (rng.normal(size=(3, total)) * 0.02)
        for p_at in (40.0, 88.0):  # second event inside the final window span
            env = np.where(t >= p_at, np.exp(-(t - p_at) / 1.5), 0.0)
            data[0] += np.sin(2 * np.pi * 8 * t) * env * 2.0
            env_s = np.where(t >= p_at + 3, np.exp(-(t - p_at - 3) / 2.5), 0.0)
            data[1] += np.sin(2 * np.pi * 4 * t) * env_s * 3.0
            data[2] += np.sin(2 * np.pi * 4 * t) * env_s * 2.6

        thr = {"P": 0.39, "S": 0.34, "N": 2.0}
        dev = picker.classify_arrays(data[None], thr, overlap=2500, blinding=(250, 250))

        fwd = jax.jit(lambda fr: model.apply(params, fr))

        def predict_np(frame):
            return np.asarray(fwd(jnp.asarray(frame, dtype=jnp.float32)[None])[0])

        orc = oracle_classify(
            data, predict_np, model.in_samples, 2500, thr, channels=list("PSN"),
            blinding=(250, 250), detrend=False, norm=model.norm,
        )
        for label in ("P", "S"):
            pk, val, valid, on, off = (a[0] for a in dev[label])
            got = [int(p) for p, v in zip(pk, valid) if v]
            want = [t[0] for t in orc[label]]
            assert got == want
        # the second P onset lives past the last uniform window's coverage
        # (uniform windows end at sample 9013; after (250,250) blinding the
        # flush window alone covers up to 9100) — the exact region the old
        # pad-to-uniform tail got wrong
        assert any(abs(p - 8800) < 100 for p in [t[0] for t in orc["P"]])
