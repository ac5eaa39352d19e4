"""Tests: parallel mesh helpers, SAC→mseed conversion, Hi-net request windows,
optimal-model ranking."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp


class TestMesh:
    def test_make_mesh_and_shard(self):
        from volpick_tpu.parallel import batch_sharding, make_mesh, replicated
        from volpick_tpu.parallel.mesh import shard_batch

        mesh = make_mesh(8)
        assert mesh.shape == {"data": 8}
        batch = {"X": jnp.ones((16, 3, 100)), "y": jnp.ones((16, 3, 100))}
        sharded = shard_batch(batch, mesh)
        assert sharded["X"].sharding == batch_sharding(mesh)
        # 2-D mesh
        mesh2 = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
        assert mesh2.shape == {"data": 4, "model": 2}

    def test_initialize_noop(self):
        from volpick_tpu.parallel import initialize_distributed

        initialize_distributed()  # single process → no-op


class TestSacConvert:
    def test_folder_roundtrip(self, tmp_path, rng):
        from volpick_tpu.core.sacio import write_sac
        from volpick_tpu.core.stream import Trace, UTC
        from volpick_tpu.acquisition.sac_convert import convert_sac_to_mseed
        from volpick_tpu.io.miniseed import read_mseed

        ev = tmp_path / "ev001"
        ev.mkdir()
        for c in "ZNE":
            tr = Trace(
                rng.normal(size=1500).astype(np.float32),
                dict(network="HV", station="KIL", channel=f"HH{c}",
                     sampling_rate=100.0, starttime=UTC("2005-06-07T08:09:10")),
            )
            write_sac(tr, ev / f"kil_{c.lower()}.sac")
        log = convert_sac_to_mseed([ev], tmp_path / "out")
        assert (log["error"].fillna("") == "").all()  # empty strings read back as NaN
        st = read_mseed(tmp_path / "out" / "ev001" / "HV.KIL..mseed")
        assert len(st) == 3
        assert {tr.stats.channel for tr in st} == {"HHZ", "HHN", "HHE"}


class TestHinet:
    def test_request_windows(self):
        from volpick_tpu.acquisition.hinet import event_request_windows

        df = pd.DataFrame(
            {
                "source_id": ["e1", "e1", "e2"],
                "source_origin_time": ["2020-01-01T00:00:00"] * 2 + ["2020-01-02T00:00:00"],
                "trace_p_arrival_time": ["2020-01-01T00:00:10", "2020-01-01T00:00:12", "2020-01-02T00:00:05"],
                "trace_s_arrival_time": ["2020-01-01T00:00:20", None, None],
            }
        )
        reqs = event_request_windows(df, pre_event_s=60, post_event_s=120, max_span_minutes=5)
        e1 = [r for r in reqs if r.event_id == "e1"]
        assert len(e1) == 1 and e1[0].span_minutes <= 5
        # window covers [origin-60, s+120]
        assert e1[0].starttime.isoformat().startswith("2019-12-31T23:59:00")

    def test_downloader_requires_hinetpy(self, tmp_path):
        from volpick_tpu.acquisition.hinet import HinetDownloader

        with pytest.raises(ImportError):
            HinetDownloader("user", "pass", tmp_path)


class TestOptimalModel:
    def test_ranking(self):
        from volpick_tpu.eval.task123 import get_optimal_model

        df = pd.DataFrame(
            {
                "dev_det_auc": [0.8, 0.95, 0.9],
                "dev_phase_mcc": [0.7, 0.9, 0.8],
                "dev_P_rmse_s": [0.5, 0.2, 0.4],
                "dev_S_rmse_s": [0.6, 0.3, 0.5],
            }
        )
        assert get_optimal_model(df) == 1
        assert get_optimal_model(pd.DataFrame({"x": [1]})) is None

    def test_sidecar_pick_file(self, tmp_path, rng):
        from volpick_tpu.core.sacio import write_sac
        from volpick_tpu.core.stream import Trace, UTC
        from volpick_tpu.acquisition.sac_convert import read_sac_with_sidecar

        tr = Trace(rng.normal(size=100).astype(np.float32),
                   dict(network="HV", station="SDC", channel="EHZ",
                        sampling_rate=100.0, starttime=UTC(0)))
        write_sac(tr, tmp_path / "x.sac")
        (tmp_path / "x.pick").write_text("start_time: 1999 7 8 9 10 33.25\nsome_other: 1 2\n")
        got = read_sac_with_sidecar(tmp_path / "x.sac")
        assert got.stats.starttime.isoformat().startswith("1999-07-08T09:10:33.25")
