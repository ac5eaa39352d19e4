"""Eval-harness tests: target generation determinism/geometry, TP/FP/FN
counting golden cases, residual stats, end-to-end task0 sweep and task123
scoring on the synthetic dataset with the published PhaseNet weights."""

import os

import numpy as np
import pandas as pd
import pytest

from volpick_tpu.data import VCSEIS
from volpick_tpu.data.synthetic import make_synthetic_dataset
from volpick_tpu.eval import (
    calculate_precision_recall_F1score,
    collect_task123_results,
    count_TP_FP_FN,
    compute_residuals,
    eval_task0,
    eval_tasks123,
    generate_task0,
    generate_task1,
    generate_task23,
    opt_prob_metrics,
    parse_task1,
    parse_task23,
    select_window_containing,
)

WEIGHTS = os.environ.get("VOLPICK_TPU_MODELS", "/root/reference/Final_models/volpick")
needs_weights = pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS, "phasenet", "volpick.pt.v1")),
    reason="published volpick weights not available",
)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("eval_ds")
    make_synthetic_dataset(d, n_events=30, n_noise=10, n_samples=6000, seed=11)
    return VCSEIS(d)


class TestTargets:
    def test_task0_geometry(self, ds, tmp_path):
        df = generate_task0(ds, tmp_path, noise_before_events=True)
        assert len(df) > 0
        w = df["end_sample"] - df["start_sample"]
        assert (w <= 3000).all() and (w > 100).all()
        eq = df[df["trace_type"] == "earthquake"]
        # every earthquake row keeps at least one contained pick column
        pick_cols = [c for c in df.columns if c.endswith("_arrival_sample")]
        assert len(pick_cols) >= 1
        assert eq[pick_cols].notna().any(axis=1).all()

    def test_task0_deterministic(self, ds, tmp_path):
        d1 = generate_task0(ds, tmp_path / "a")
        d2 = generate_task0(ds, tmp_path / "b")
        pd.testing.assert_frame_equal(d1.reset_index(drop=True), d2.reset_index(drop=True))

    def test_task1(self, ds, tmp_path):
        df = generate_task1(ds, tmp_path)
        assert set(df["trace_type"]) == {"earthquake", "noise"}

    def test_task23_isolation(self, ds, tmp_path):
        df = generate_task23(ds, tmp_path)
        assert len(df) > 0
        assert set(df["phase_label"]) <= {"P", "S"}
        # onset inside window with 50-sample bounds
        ok = (df["phase_onset"] >= df["start_sample"]) & (df["phase_onset"] < df["end_sample"])
        assert ok.all()

    def test_select_window_containing(self):
        np.random.seed(0)
        s0, s1 = select_window_containing(10000, 3000, containing=5000)
        assert s1 - s0 == 3000 and s0 <= 5000 - 100 and 5000 + 100 <= s1
        assert select_window_containing(1000, 3000) == (0, 1000)


class TestCounting:
    def test_counting_golden(self):
        truth = [np.array([100.0]), np.array([]), np.array([500.0]), np.array([900.0])]
        pred = [np.array([120.0]), np.array([300.0]), np.array([]), np.array([820.0, 960.0])]
        TP, FP, FN, *_ = count_TP_FP_FN(truth, pred, tp_thre=0.5, sampling_rate=100)
        # trace0: |20|/100=0.2s → TP; trace1: FP; trace2: FN;
        # trace3: 820 is 0.8s off → FP, 960 is 0.6s off → FP, truth → FN
        assert (TP, FP, FN) == (1, 3, 2)
        p, r, f1 = calculate_precision_recall_F1score(TP, FP, FN)
        assert p == pytest.approx(0.25) and r == pytest.approx(1 / 3)

    def test_residuals(self):
        truth = [np.array([100.0]), np.array([200.0])]
        pred = [np.array([110.0]), np.array([150.0, 195.0])]
        res = compute_residuals(truth, pred, 100.0)
        np.testing.assert_allclose(sorted(res), [-0.5, -0.05, 0.1])

    def test_bootstrap_f1_ci(self):
        from volpick_tpu.eval.task0 import bootstrap_f1

        rng = np.random.default_rng(0)
        n = 400
        truth, pred = [], []
        for i in range(n):
            t = float(rng.uniform(100, 900))
            truth.append(np.array([t]))
            # 80% of traces picked within tolerance, 20% missed
            pred.append(np.array([t + rng.normal(0, 5)]) if rng.random() < 0.8 else np.array([]))
        res = bootstrap_f1(truth, pred, n_boot=500, seed=1)
        assert res["n"] == n
        # point estimate inside its own CI, CI inside [0, 1] and nondegenerate
        assert 0.0 < res["lo"] <= res["f1"] <= res["hi"] < 1.0
        # the expected F1 of an 80%-recall/100%-precision picker is ~0.89
        assert res["lo"] < 2 * 0.8 / 1.8 < res["hi"]
        # CI width shrinks roughly as 1/sqrt(n): a 4x smaller sample is wider
        res_small = bootstrap_f1(truth[:100], pred[:100], n_boot=500, seed=1)
        assert (res_small["hi"] - res_small["lo"]) > (res["hi"] - res["lo"])
        # deterministic under a fixed seed
        res2 = bootstrap_f1(truth, pred, n_boot=500, seed=1)
        assert res2 == res

    def test_pick_list_cell_parsing_tolerates_numpy2_reprs(self):
        """{set}_task0.csv pick cells written before the writer coerced to
        python floats look like "[np.float64(3355.0)]" (numpy-2 scalar
        reprs); bootstrap_f1_from_artifacts must parse both formats — the
        fallback exists for artifacts already on disk."""
        import ast
        import re

        clean = re.compile(r"np\.\w+")
        for raw, want in (
            ("[3355.0, 12.5]", [3355.0, 12.5]),
            ("[np.float64(3355.0)]", [3355.0]),
            ("[np.float64(1.0), np.float32(2.5)]", [1.0, 2.5]),
            ("[]", []),
        ):
            got = list(np.asarray(ast.literal_eval(clean.sub("", raw)), dtype=float))
            assert got == want, (raw, got)


@needs_weights
class TestEndToEnd:
    @pytest.fixture(scope="class")
    def model_params(self):
        from volpick_tpu.models import from_pretrained

        return from_pretrained("phasenet", search_paths=[WEIGHTS])

    def test_task0_sweep(self, ds, tmp_path, model_params):
        model, params = model_params
        generate_task0(ds, tmp_path / "targets")
        out = eval_task0(
            model,
            params,
            ds,
            tmp_path / "targets",
            tmp_path / "eval",
            sets=("dev", "test"),
            prob_thresholds=(0.3, 0.5, 0.7),
            batch_size=16,
        )
        assert (tmp_path / "eval" / "test_metrics.csv").exists()
        m = pd.read_csv(tmp_path / "eval" / "test_metrics.csv")
        assert len(m) == 3
        # golden header: the exact column set+order of the reference's
        # {set}_metrics.csv (reference `eval_taks0.py:722-783`)
        golden = ["prob_thre", "tp_thre"] + [
            f"{ph}_{c}"
            for ph in ("p", "s")
            for c in (
                "TP", "FP", "FN", "precision", "recall", "F1score",
                "mean", "median", "std", "MAE", "MAD", "out",
                "modified_mean", "modified_median", "modified_std",
                "modified_RMSE", "modified_MAE", "modified_MAD",
                "modified_mean2", "modified_median2", "modified_std2",
                "modified_RMSE2", "modified_MAE2", "modified_MAD2",
            )
        ]
        assert list(m.columns) == golden
        # synthetic events are easy: some recall at moderate threshold
        assert m["p_recall"].max() > 0.3
        opt = opt_prob_metrics(tmp_path / "eval")
        assert "p_threshold" in opt and "test_p_F1score" in opt

    def test_task123(self, ds, tmp_path, model_params):
        model, params = model_params
        generate_task1(ds, tmp_path / "targets", noise_before_events=True)
        generate_task23(ds, tmp_path / "targets")
        eval_tasks123(model, params, ds, tmp_path / "targets", tmp_path / "eval", batch_size=16)
        # golden prediction columns appended to the targets table, exactly as
        # the reference writes {set}_task{n}.csv (`eval_taks123.py:152-163`)
        t23_csv = pd.read_csv(tmp_path / "eval" / "test_task23.csv")
        assert list(t23_csv.columns[-4:]) == [
            "score_detection", "score_p_or_s", "p_sample_pred", "s_sample_pred"
        ]
        t1 = parse_task1(tmp_path / "eval")
        assert "dev_det_auc" in t1 and "test_det_f1" in t1
        assert t1["dev_det_auc"] > 0.6  # synthetic events are detectable
        t23 = parse_task23(tmp_path / "eval")
        if "test_P_mae_s" in t23:
            assert t23["test_P_mae_s"] < 5.0
        df = collect_task123_results(tmp_path, ["eval"])
        assert len(df) == 1


class TestSteeredDevicePath:
    def test_steered_frames_matches_eval_batch(self, ds):
        """The fused device framing+conditioning equals the host-side
        eval_batch reference implementation."""
        import jax.numpy as jnp

        from volpick_tpu.pipeline.generator import (
            RawBatchSource,
            eval_batch,
            steered_frames,
            steered_window_offsets,
        )

        window = 601
        idxs = np.arange(8)
        ss = np.array([100, 2000, 5500, 0, 300, 5900, 2500, 1][:8]) % 5900
        es = ss + 80
        for detrend in (False, True):
            x_host, borders_host = eval_batch(
                ds, idxs, window, ss, es, norm="peak", detrend=detrend
            )
            src = RawBatchSource(ds)
            batch = src.take(idxs)
            w0, borders = steered_window_offsets(batch["len"], ss, es, window)
            np.testing.assert_array_equal(borders, borders_host)
            x_dev = np.asarray(
                steered_frames(jnp.asarray(batch["x"]), jnp.asarray(w0), window,
                               detrend=detrend, norm="peak")
            )
            np.testing.assert_allclose(x_dev, x_host, atol=2e-6)

    def test_steered_runner_demeans_for_eqt(self, ds):
        """Eval-time conditioning is demean (NOT detrend) for every model,
        EQT included: the reference's eval augmentations are SteeredWindow +
        Normalize(demean_axis=-1) for all architectures (reference
        `volpick/model/models.py:445-452` PhaseNet, `:849-856` EQT); detrend
        appears only in EQT's TRAINING block (`:663`). Regression for the r4
        bias investigation (scripts/run_eqt_bias_check.py): on a strongly
        trending input, the runner's curves must match the demean-conditioned
        forward and differ from the detrend-conditioned one."""
        import jax
        import jax.numpy as jnp

        from volpick_tpu.eval.task0 import _SteeredRunner
        from volpick_tpu.models.eqtransformer import EQTransformer
        from volpick_tpu.ops.signal import (
            demean,
            detrend_linear,
            normalize_amplitude,
        )

        model = EQTransformer()
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        n = 9000
        # strong linear ramp makes demean and detrend conditioning diverge
        x = (rng.normal(size=(2, 3, n)) * 0.1
             + np.linspace(0, 50, n)[None, None, :]).astype(np.float32)

        class _FakeDS:
            sampling_rate = 100.0
            metadata = pd.DataFrame({
                "trace_name": ["a", "b"],
                "trace_sampling_rate_hz": [100.0, 100.0],
                "trace_p_arrival_sample": [3000.0, 3500.0],
                "trace_s_arrival_sample": [3400.0, 4100.0],
            })

            def get_sample(self, i):
                return x[i], {}

            def get_waveforms(self, i):
                return x[i]

            def __len__(self):
                return 2

        targets = pd.DataFrame({
            "trace_idx": [0, 1], "start_sample": [1500, 2000],
            "end_sample": [4500, 5000], "trace_split": ["test", "test"],
        })
        runner = _SteeredRunner(model, params, batch_size=2)
        curves, borders = runner.prob_curves(_FakeDS(), targets)

        w0 = targets["start_sample"].to_numpy() - borders[:, 0]
        frames = np.stack([x[i, :, int(w0[i]):int(w0[i]) + 6000] for i in (0, 1)])
        for cond, should_match in ((demean, True), (detrend_linear, False)):
            fr = normalize_amplitude(cond(jnp.asarray(frames)),
                                     norm=model.norm, per_channel=True)
            out = model.apply(params, fr)
            ref = np.asarray(jnp.stack(out, axis=1))
            diff = float(np.max(np.abs(ref - curves)))
            if should_match:
                assert diff < 1e-5, f"runner must demean (diff {diff})"
            else:
                assert diff > 1e-3, "sanity: detrend variant should differ"

    @needs_weights
    def test_evaluate_sweep_equals_per_threshold(self, ds, tmp_path):
        """The single-pass all-thresholds device sweep produces exactly the
        pick lists of the per-threshold evaluate() path."""
        from volpick_tpu.eval.task0 import evaluate, evaluate_sweep
        from volpick_tpu.models import from_pretrained

        model, params = from_pretrained("phasenet", search_paths=[WEIGHTS])
        targets = generate_task0(ds, tmp_path / "t")
        targets = targets[targets["trace_split"] == "test"].reset_index(drop=True)
        thresholds = (0.2, 0.4, 0.7)
        sweep = evaluate_sweep(model, params, ds, targets, thresholds, batch_size=16)
        for thr, (p_s, s_s) in zip(thresholds, sweep):
            p_e, s_e = evaluate(model, params, ds, targets, thr, batch_size=16)
            for a, b in zip(p_s, p_e):
                np.testing.assert_array_equal(np.sort(a), np.sort(b))
            for a, b in zip(s_s, s_e):
                np.testing.assert_array_equal(np.sort(a), np.sort(b))

    @needs_weights
    def test_chunked_sweep_equals_unchunked(self, ds, tmp_path):
        from volpick_tpu.models import from_pretrained

        model, params = from_pretrained("phasenet", search_paths=[WEIGHTS])
        generate_task0(ds, tmp_path / "t")
        a = eval_task0(model, params, ds, tmp_path / "t", tmp_path / "a",
                       sets=("test",), prob_thresholds=(0.3, 0.6), batch_size=16,
                       curve_chunk=7)  # forces several chunks
        b = eval_task0(model, params, ds, tmp_path / "t", tmp_path / "b",
                       sets=("test",), prob_thresholds=(0.3, 0.6), batch_size=16,
                       curve_chunk=100000)
        pd.testing.assert_frame_equal(a["test"], b["test"])
        pa = pd.read_csv(tmp_path / "a" / "test_task0.csv")
        pb = pd.read_csv(tmp_path / "b" / "test_task0.csv")
        pd.testing.assert_frame_equal(pa, pb)


@needs_weights
class TestTNR:
    def test_true_negative_rate(self, ds, tmp_path):
        from volpick_tpu.models import from_pretrained
        from volpick_tpu.eval.task0 import eval_task0_true_negative_rate

        model, params = from_pretrained("phasenet", search_paths=[WEIGHTS])
        generate_task0(ds, tmp_path / "t", noise_before_events=True)
        res = eval_task0_true_negative_rate(
            model, params, ds, tmp_path / "t", tmp_path / "o",
            prob_thresholds=(0.3, 0.6), batch_size=16,
        )
        import pandas as pd

        df = pd.read_csv(tmp_path / "o" / "test_tnr.csv")
        assert {"p_TN", "p_FP", "p_true_negative_rate"} <= set(df.columns)
        assert (df["p_true_negative_rate"].dropna() >= 0).all()
