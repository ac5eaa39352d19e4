"""WIN32 (Hi-net) native decoder tests: writer/decoder round trips over every
diff size code, channel-table parsing, malformed-input robustness, and the
end-to-end JapanDataset-equivalent path (win32 event dirs → mseed →
SeisBench dataset), replacing the reference's win32tools pipeline
(reference `volpick/data/data.py:897-1388`)."""

import numpy as np
import pandas as pd
import pytest

from volpick_tpu.core.stream import Stream, Trace, UTC
from volpick_tpu.io.win32 import (
    read_win32,
    read_win32_channel_table,
    write_win32,
)


def make_trace(data, station="C0100", channel="CH", sr=100.0, t0=0.0, network="N"):
    return Trace(
        np.asarray(data, dtype=np.float64),
        dict(network=network, station=station, location="", channel=channel,
             sampling_rate=sr, starttime=UTC(t0)),
    )


class TestRoundTrip:
    @pytest.mark.parametrize(
        "amplitude,expected_code",
        [(3, 0), (100, 1), (20_000, 2), (5_000_000, 3), (200_000_000, 4)],
    )
    def test_each_diff_size(self, tmp_path, rng, amplitude, expected_code):
        """Diffs of each magnitude round-trip bit-exactly."""
        n = 300  # 3 s at 100 Hz
        steps = rng.integers(-amplitude, amplitude + 1, size=n)
        data = np.cumsum(steps).astype(np.float64)
        # the format carries int32 counts: keep the random walk in range
        # (the writer rejects out-of-range data loudly)
        assert np.abs(data).max() < 2**31, "test fixture drifted out of int32"
        tr = make_trace(data, t0=1_700_000_000.0)
        write_win32(Stream([tr]), tmp_path / "a.cnt")
        raw = (tmp_path / "a.cnt").read_bytes()
        # sample-size code of the first channel block (offset 12+4, top nibble)
        assert raw[16] >> 4 == expected_code
        st = read_win32(tmp_path / "a.cnt")
        assert len(st) == 1
        np.testing.assert_array_equal(st[0].data, data)
        assert st[0].stats.sampling_rate == 100.0
        assert abs(st[0].stats.starttime.timestamp - 1_700_000_000.0) < 1e-9

    def test_multichannel_multisecond(self, tmp_path, rng):
        t0 = 1_600_000_000.0
        trs = [
            make_trace(np.cumsum(rng.integers(-50, 51, 500)), station=f"S{i}", t0=t0)
            for i in range(3)
        ]
        write_win32(Stream(trs), tmp_path / "m.cnt")
        st = read_win32(tmp_path / "m.cnt")
        assert len(st) == 3  # merged back into 3 continuous traces
        for got, tr in zip(sorted(st, key=lambda t: t.stats.station), trs):
            assert got.stats.npts == 500
            np.testing.assert_array_equal(got.data, tr.data)

    def test_mixed_rates(self, tmp_path, rng):
        trs = [
            make_trace(np.cumsum(rng.integers(-5, 6, 200)), station="HI", sr=100.0),
            make_trace(np.cumsum(rng.integers(-5, 6, 40)), station="LO", sr=20.0),
        ]
        write_win32(Stream(trs), tmp_path / "r.cnt")
        st = read_win32(tmp_path / "r.cnt")
        rates = {tr.stats.station: tr.stats.sampling_rate for tr in st}
        assert rates == {"C0100": 100.0, "C0101": 20.0} or set(rates.values()) == {100.0, 20.0}

    def test_channel_table_names(self, tmp_path, rng):
        data = np.cumsum(rng.integers(-5, 6, 100))
        tr = make_trace(data)
        ids = write_win32(Stream([tr]), tmp_path / "c.cnt")
        chan = next(iter(ids.values()))
        table_txt = (
            "#  ChID flag delay  station comp  size bits  sens  unit  T0  damp  gain  lsb\n"
            f"  {chan:04X} 1 0 VOLC U 1 27 1.023e+00 m/s 1.0 0.7 100.0 1.192093e-07\n"
        )
        (tmp_path / "t.euc.ch").write_text(table_txt)
        table = read_win32_channel_table(tmp_path / "t.euc.ch")
        assert table.loc[chan, "station"] == "VOLC"
        assert table.loc[chan, "component"] == "U"
        assert table.loc[chan, "scale"] == pytest.approx(
            1.192093e-07 / (1.023 * 10 ** (100.0 / 20.0))
        )
        st = read_win32(tmp_path / "c.cnt", channel_table=table)
        assert st[0].stats.station == "VOLC"
        assert st[0].stats.channel == "U"


class TestRobustness:
    def test_truncated_file(self, tmp_path, rng):
        data = np.cumsum(rng.integers(-5, 6, 500))
        write_win32(Stream([make_trace(data)]), tmp_path / "t.cnt")
        raw = (tmp_path / "t.cnt").read_bytes()
        # cut inside the last second block: that block is dropped, earlier
        # seconds decode intact
        (tmp_path / "cut.cnt").write_bytes(raw[: len(raw) - 20])
        st = read_win32(tmp_path / "cut.cnt")
        total = sum(tr.stats.npts for tr in st)
        assert 0 < total < 500
        np.testing.assert_array_equal(st[0].data, data[: st[0].stats.npts])

    def test_garbage_raises(self, tmp_path, rng):
        for seed in range(10):
            r = np.random.default_rng(seed)
            (tmp_path / "g.cnt").write_bytes(r.integers(0, 256, 2048, dtype=np.uint8).tobytes())
            with pytest.raises(ValueError):
                read_win32(tmp_path / "g.cnt")

    def test_bad_rate_rejected_by_writer(self, tmp_path):
        tr = make_trace(np.zeros(10), sr=12.5)
        with pytest.raises(ValueError):
            write_win32(Stream([tr]), tmp_path / "x.cnt")


class TestJapanEndToEnd:
    def test_event_dirs_to_dataset(self, tmp_path, rng):
        """JMA-style catalog rows + synthetic win32 archives → mseed →
        SeisBench dataset, all native."""
        from volpick_tpu.acquisition.convert import convert_catalog_to_dataset
        from volpick_tpu.acquisition.hinet import convert_win32_event_dirs
        from volpick_tpu.io.miniseed import read_mseed

        save = tmp_path / "japan"
        rows = []
        for i in range(2):
            evid = f"JMA202001{i:02d}"
            t0 = 1_577_836_800.0 + i * 3600  # second-aligned origin
            # 3 components of 180 s at 100 Hz with an onset step
            ev_dir = save / evid
            ev_dir.mkdir(parents=True)
            trs = []
            for k, raw_comp in enumerate(("U0", "N0", "E0")):
                steps = rng.integers(-4, 5, 18000).astype(np.int64)
                steps[8000:8200] += rng.integers(-300, 300, 200)
                # distinct channel per component so trace ids (and hence
                # win32 channel numbers) differ
                tr = make_trace(np.cumsum(steps), station="VOLA", t0=t0,
                                channel=raw_comp)
                trs.append(tr)
            write_win32(
                Stream(trs), ev_dir / "data.cnt",
                chan_ids={tr.id: 0x200 + k for k, tr in enumerate(trs)},
            )
            (ev_dir / "table.ch").write_text(
                "\n".join(
                    f"{0x200 + k:04X} 1 0 VOLA {comp} 1 27 1.0 m/s 1.0 0.7 0.0 1.0"
                    for k, comp in enumerate(("U", "N", "E"))
                )
            )
            rows.append({
                "source_id": evid,
                "source_origin_time": UTC(t0 + 70.0).isoformat(),
                "source_latitude_deg": 35.0,
                "source_longitude_deg": 139.0,
                "source_depth_km": 5.0,
                "source_magnitude": 1.5,
                "source_magnitude_type": "V",
                "source_type": "lp",
                "station_network_code": "N",
                "station_code": "VOLA",
                "station_location_code": "",
                "trace_channel": "",
                "trace_p_arrival_time": UTC(t0 + 80.0).isoformat(),
                "trace_s_arrival_time": UTC(t0 + 84.0).isoformat(),
                "trace_name": f"{evid}_N.VOLA",
            })
        catalog_df = pd.DataFrame(rows)
        log = convert_win32_event_dirs(save, catalog_df)
        assert (log["error"] == "").all(), log
        assert (log["n_components"] == 3).all()

        # mseed written per trace_name with ZNE-selectable channels
        st = read_mseed(save / "mseed" / f"{rows[0]['trace_name']}.mseed")
        comps = {tr.stats.channel for tr in st}
        assert comps == {"Z", "N", "E"}  # U renamed to Z
        # trimmed to [P-60, S+120] ∩ trace span = [t0+20, t0+180] → ~160 s
        assert all(abs(tr.stats.npts - 16000) < 300 for tr in st)

        ds_dir = tmp_path / "ds"
        convert_catalog_to_dataset(
            catalog_df,
            lambda name: read_mseed(save / "mseed" / f"{name}.mseed"),
            ds_dir,
            seed=3,
        )
        from volpick_tpu.data import WaveformDataset

        ds = WaveformDataset(ds_dir)
        assert len(ds) == 2
        md = ds.metadata
        assert md["trace_p_arrival_sample"].notna().all()

    def test_missing_event_dir_logged(self, tmp_path):
        from volpick_tpu.acquisition.hinet import convert_win32_event_dirs

        df = pd.DataFrame([
            {"source_id": "NOPE", "station_code": "X", "trace_name": "NOPE_N.X"}
        ])
        log = convert_win32_event_dirs(tmp_path, df)
        assert list(log["error"]) == ["NoEventDirectory"]


class TestInt32Contract:
    def test_out_of_range_counts_rejected(self, tmp_path):
        """Samples beyond int32 must raise, not wrap by 2^32 on decode."""
        data = np.array([0.0, 2.0**31 + 10], dtype=np.float64)
        tr = make_trace(np.pad(data, (0, 98)), sr=100.0)
        with pytest.raises(ValueError, match="int32"):
            write_win32(Stream([tr]), tmp_path / "o.cnt")
