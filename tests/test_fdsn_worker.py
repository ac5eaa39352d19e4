"""FDSN download-worker QC tests via an injected fake client — the branches
(P>S, P<origin, provider failover, empty data, picks-in-gap, write + log
schema) run without obspy or network (reference worker
`volpick/data/data.py:2936-3272`)."""

import numpy as np
import pandas as pd
import pytest

from volpick_tpu.acquisition.download import (
    _download_worker,
    assemble_subprocess_csvlogs,
    filter_failed_downloads,
)
from volpick_tpu.core.stream import Stream, Trace, UTC


class FakeFDSNException(Exception):
    pass


class FakeClient:
    """obspy-Client-shaped fake backed by a dict of streams per station."""

    def __init__(self, provider, streams=None, fail=()):
        self.provider = provider
        self.streams = streams or {}
        self.fail = set(fail)

    def get_waveforms(self, network, station, location, channel, starttime, endtime):
        if station in self.fail or station not in self.streams:
            raise FakeFDSNException(f"no data for {station}")
        return self.streams[station]


def make_stream(station, t0, npts=12000, sr=100.0, gap=None):
    """3-component stream starting at epoch t0; `gap=(g0, g1)` splits the Z
    trace so [g0, g1] has no data."""
    rng = np.random.default_rng(0)
    hdr = dict(network="AV", station=station, location="", sampling_rate=sr)
    st = Stream()
    for c in "ZNE":
        if c == "Z" and gap is not None:
            n1 = int((gap[0] - t0) * sr)
            st.append(Trace(rng.normal(size=n1), dict(hdr, channel=f"BH{c}", starttime=UTC(t0))))
            n2 = npts - int((gap[1] - t0) * sr)
            st.append(Trace(rng.normal(size=n2), dict(hdr, channel=f"BH{c}", starttime=UTC(gap[1]))))
        else:
            st.append(Trace(rng.normal(size=npts), dict(hdr, channel=f"BH{c}", starttime=UTC(t0))))
    return st


def catalog_row(name, station, p=None, s=None, origin=None):
    return {
        "trace_name": name,
        "station_network_code": "AV",
        "station_code": station,
        "station_location_code": "",
        "trace_channel": "BH",
        "trace_p_arrival_time": UTC(p).isoformat() if p is not None else None,
        "trace_s_arrival_time": UTC(s).isoformat() if s is not None else None,
        "source_origin_time": UTC(origin).isoformat() if origin is not None else None,
    }


T0 = 1_600_000_000.0


def run_worker(tmp_path, rows, streams, providers=("FAKE",), fail=(), sampling_rate=None):
    (tmp_path / "mseed").mkdir(exist_ok=True)
    written = {}

    def writer(st, fname):
        written[fname.name] = st

    _download_worker(
        pd.DataFrame(rows),
        str(tmp_path),
        list(providers),
        time_window=120.0,
        sampling_rate=sampling_rate,
        pid=0,
        client_factory=lambda p: FakeClient(p, streams=streams, fail=fail),
        stream_writer=writer,
        time_cls=float,
    )
    log = pd.read_csv(tmp_path / "download_log_p0.csv")
    log["error"] = log["error"].fillna("")
    return log, written


class TestQCBranches:
    def test_p_after_s_rejected(self, tmp_path):
        rows = [catalog_row("r0_AV.STA", "STA", p=T0 + 40, s=T0 + 30, origin=T0)]
        log, written = run_worker(tmp_path, rows, {"STA": make_stream("STA", T0)})
        assert list(log["error"]) == ["P_after_S"] and not written

    def test_p_before_origin_rejected(self, tmp_path):
        rows = [catalog_row("r1_AV.STA", "STA", p=T0 + 10, s=T0 + 20, origin=T0 + 15)]
        log, written = run_worker(tmp_path, rows, {"STA": make_stream("STA", T0)})
        assert list(log["error"]) == ["P_before_origin"] and not written

    def test_pick_in_gap_rejected(self, tmp_path):
        # P at T0+40 falls inside the Z gap [T0+35, T0+45]
        st = make_stream("STA", T0, gap=(T0 + 35, T0 + 45))
        rows = [catalog_row("r2_AV.STA", "STA", p=T0 + 40, s=T0 + 50, origin=T0)]
        log, written = run_worker(tmp_path, rows, {"STA": st})
        # N/E traces cover T0+40, so the pick is NOT out of all traces —
        # matches the reference's any-trace-covers rule
        assert list(log["error"]) == [""]
        assert len(written) == 1

    def test_pick_outside_all_traces_rejected(self, tmp_path):
        # stream only spans [T0, T0+60); S pick at T0+90 is beyond every trace
        st = make_stream("STA", T0, npts=6000)
        rows = [catalog_row("r3_AV.STA", "STA", p=T0 + 40, s=T0 + 90, origin=T0)]
        log, written = run_worker(tmp_path, rows, {"STA": st})
        assert list(log["error"]) == ["phases_in_gap"] and not written

    def test_no_data_logged(self, tmp_path):
        rows = [catalog_row("r4_AV.NOPE", "NOPE", p=T0 + 40, origin=T0)]
        log, written = run_worker(tmp_path, rows, {})
        assert list(log["error"]) == ["FakeFDSNException"] and not written

    def test_provider_failover(self, tmp_path):
        """First provider fails, second succeeds: trace written, error clear."""
        calls = []

        def factory(provider):
            calls.append(provider)
            if provider == "BAD":
                return FakeClient(provider, streams={})
            return FakeClient(provider, streams={"STA": make_stream("STA", T0)})

        (tmp_path / "mseed").mkdir(exist_ok=True)
        written = {}
        _download_worker(
            pd.DataFrame([catalog_row("r5_AV.STA", "STA", p=T0 + 40, s=T0 + 44, origin=T0)]),
            str(tmp_path), ["BAD", "GOOD"], 120.0, None, 0,
            client_factory=factory,
            stream_writer=lambda st, f: written.update({f.name: st}),
            time_cls=float,
        )
        log = pd.read_csv(tmp_path / "download_log_p0.csv")
        assert calls == ["BAD", "GOOD"]
        assert log.iloc[0]["error"] == "" if not pd.isna(log.iloc[0]["error"]) else True
        assert "r5_AV.STA.mseed" in written

    def test_success_and_log_schema(self, tmp_path):
        rows = [
            catalog_row("ok_AV.STA", "STA", p=T0 + 40, s=T0 + 44, origin=T0),
            catalog_row("bad_AV.STA", "STA", p=T0 + 44, s=T0 + 40, origin=T0),
        ]
        log, written = run_worker(tmp_path, rows, {"STA": make_stream("STA", T0)})
        assert list(log.columns) == ["trace_name", "error"]
        assert "ok_AV.STA.mseed" in written
        # the failure-log feeds retry filtering: only real errors retry, QC
        # rejections like P_after_S are permanent
        retry = filter_failed_downloads(log, exclude_errors=("FakeFDSNException", "P_after_S"))
        assert len(retry) == 0

    def test_logs_merge(self, tmp_path):
        rows = [catalog_row("m0_AV.STA", "STA", p=T0 + 40, origin=T0)]
        run_worker(tmp_path, rows, {"STA": make_stream("STA", T0)})
        merged = assemble_subprocess_csvlogs(tmp_path, "download_log_p*.csv", "download_log.csv")
        assert len(merged) == 1
        assert (tmp_path / "download_log.csv").exists()
        assert not (tmp_path / "download_log_p0.csv").exists()
