"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), as real multi-chip TPU
hardware is not available in CI. Must be set before jax is imported.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# startup (before the env var is consulted); pin it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


# ----------------------------------------------------------------- slow tier
# Tests measured >~10 s on one CPU (pytest --durations, full-suite run) are
# auto-marked `slow` here so the fast tier (`pytest -m "not slow"`) stays
# under ~5 minutes for iteration; CI cadence runs the full suite. Central
# list (rather than per-test decorators) so the tiering policy and its
# duration basis live in one place. Module-level entries mark every test in
# the file.
SLOW_TESTS = {
    "test_streaming.py": {
        "test_streaming_matches_offline",
        "test_multichip_classify_matches_single",
    },
    "test_picker.py": {
        "test_segmented_matches_single_pass",
        "test_bf16_picks_close_to_f32",
        "test_classify_finds_event",
        "test_multi_station_batch",
        "test_classify_eqt",
    },
    "test_oracle.py": {
        "test_phasenet_tail_matches_oracle",
        "test_short_stream_picks_clamped",
        "test_max_stacking_with_flush",
        "test_overlaps",
    },
    "test_model_parity.py": {
        "test_random_init_forward",
        "test_forward_matches_torch_oracle",
    },
    "test_tpupicknet.py": {
        "test_classify_integration",
        "test_shapes_and_softmax",
        "test_learns_on_synthetic",
    },
    "test_ops.py": {
        "test_scan_methods_exact",
        "test_device_matches_numpy_oracle",
        "test_fuzz_vs_oracle_batched",
        "test_rowwise_equals_per_call",
    },
    "test_eval.py": {
        "test_evaluate_sweep_equals_per_threshold",
        "test_task0_sweep",
        "test_true_negative_rate",
        "test_chunked_sweep_equals_unchunked",
        "test_task123",
    },
    "test_tensorboard.py": {
        "test_trainer_writes_tb_directory",
        "test_tensorboard_reader_parses_our_file",
    },
    "test_train.py": {
        "test_smoke_train_eqt_with_ema",
        "test_smoke_train_phasenet",
    },
    "test_voleqt.py": {
        "test_classify_channels",
        "test_smoke_train",
        "test_four_heads_and_shapes",
    },
    "test_pipeline.py": {
        "test_full_program_runs_and_is_deterministic",
        "test_epoch_batches",
        "test_labels_stay_valid_distribution",
    },
    "test_pallas.py": {"test_matches_model_rescnn"},
    "test_parity_gaps.py": {"test_pick_impact_bounded"},
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        names = SLOW_TESTS.get(os.path.basename(str(item.fspath)))
        if names and item.originalname in names:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    yield


@pytest.fixture()
def rng():
    # function-scoped on purpose: a session-scoped generator made every
    # test's data depend on how many draws ran before it, so tests passed
    # or failed based on suite composition (the win32 int32-range flake)
    return np.random.default_rng(42)
