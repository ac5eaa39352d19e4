"""Acquisition-layer tests: hypoinverse parsing with synthetic fixtures,
catalog flattening, noise-table logic, converter end-to-end."""

import numpy as np
import pandas as pd
import pytest

from volpick_tpu.acquisition import (
    Catalog,
    Event,
    Magnitude,
    Origin,
    PhasePick,
    group_picks,
    read_hypoinverse_catalog,
    read_hypoinverse_summary,
)
from volpick_tpu.acquisition.convert import (
    convert_catalog_to_dataset,
    stream_to_array,
    trace_has_spikes,
)
from volpick_tpu.acquisition.download import (
    conservative_event_end,
    create_noise_table,
    filter_failed_downloads,
)
from volpick_tpu.core.stream import Stream, Trace, UTC


def _pad(s, n):
    return (s + " " * n)[:n]


def make_summary_line(event_id, etype="vt", mag=1.5, time="2020/01/02 03:04:05.60",
                      lat=61.2345, lon=-152.1234, dep=3.21):
    line = _pad(time, 26)
    line += _pad(f"{lat:8.4f}", 8)
    line += _pad(f"{lon:10.4f}", 10)
    line += _pad(f"{dep:6.2f}", 6)
    line = _pad(line, 52)
    line += _pad(f"{mag:5.2f}", 5)  # [52:57]
    line += " "
    line += _pad("l", 2)  # mag type [58:60]
    line = _pad(line, 99)
    line += _pad(event_id, 9)  # [99:108]
    line = _pad(line, 118) + etype
    return line


def make_archive_summary_line(event_id, year=2020, month=1, day=2, hh=3, mm=4, sec=5.60,
                              lat=61.2345, lon=-152.1234, dep_km=3.21):
    # [0:16] origin time YYYYMMDDHHMMSSss
    line = f"{year:04d}{month:02d}{day:02d}{hh:02d}{mm:02d}{int(sec):02d}{int(round((sec % 1) * 100)):02d}"
    lat_deg = int(abs(lat))
    lat_min = (abs(lat) - lat_deg) * 60
    line += f"{lat_deg:2d}{'S' if lat < 0 else ' '}{int(round(lat_min * 100)):4d}"
    lon_deg = int(abs(lon))
    lon_min = (abs(lon) - lon_deg) * 60
    line += f"{lon_deg:3d}{' ' if lon < 0 else 'E'}{int(round(lon_min * 100)):4d}"
    line += f"{int(round(dep_km * 100)):5d}"
    line = _pad(line, 85)
    line += f"{123:4d}{456:4d}"  # errors /100 → 1.23, 4.56 km
    line = _pad(line, 136)
    line += _pad(event_id, 10)
    return line


def make_station_line(sta="SPBG", net="AV", cha="BHZ", year=2020, month=1, day=2,
                      hh=3, mm=4, p_sec=7.89, s_sec=None, p_weight=1.0, s_weight=0.5,
                      first_motion="U", loc="--"):
    line = _pad(sta, 5) + _pad(net, 2) + "  " + _pad(cha, 3)
    line = _pad(line, 13)
    line += _pad("iP" if p_sec is not None else "", 2)  # p remark [13:15]
    line += first_motion if p_sec is not None else " "  # [15]
    line = _pad(line, 17)
    line += f"{year:04d}{month:02d}{day:02d}{hh:02d}{mm:02d}"  # [17:29]
    line += f"{int(round(p_sec * 100)):5d}" if p_sec is not None else " " * 5  # [29:34]
    line = _pad(line, 38)
    line += f"{int(round(p_weight * 100)):3d}" if p_sec is not None else " " * 3  # [38:41]
    line += f"{int(round(s_sec * 100)):5d}" if s_sec is not None else " " * 5  # [41:46]
    line += _pad("eS" if s_sec is not None else "", 2)  # s remark [46:48]
    line = _pad(line, 63)
    line += f"{int(round(s_weight * 100)):3d}" if s_sec is not None else " " * 3  # [63:66]
    line = _pad(line, 111)
    line += _pad(loc, 2)
    return line


def make_terminator(event_id):
    return _pad("", 62) + _pad(event_id, 10)


@pytest.fixture
def hypo_files(tmp_path):
    summary = tmp_path / "summary.txt"
    with open(summary, "w") as f:
        f.write("header1\nheader2\n")
        f.write(make_summary_line("1001", etype="lp") + "\n")
        f.write(make_summary_line("1002", etype="vt", mag=2.5) + "\n")
    archive = tmp_path / "archive.arc"
    with open(archive, "w") as f:
        f.write(make_archive_summary_line("1001") + "\n")
        f.write(make_station_line(sta="AAAA", p_sec=7.89, s_sec=9.5) + "\n")
        f.write(make_station_line(sta="BBBB", p_sec=8.1, s_sec=None) + "\n")
        f.write(make_terminator("1001") + "\n")
        f.write(make_archive_summary_line("1002", hh=4) + "\n")
        f.write(make_station_line(sta="CCCC", p_sec=3.0, s_sec=5.0) + "\n")
        f.write(make_terminator("1002") + "\n")
    return archive, summary


class TestHypoinverse:
    def test_summary(self, hypo_files):
        _, summary = hypo_files
        d = read_hypoinverse_summary(summary)
        assert set(d) == {"1001", "1002"}
        etype, mag, mag_type, t, lat, lon, dep = d["1001"]
        assert etype == "lp" and mag == pytest.approx(1.5)
        assert mag_type == "ml"
        assert lat == pytest.approx(61.2345) and lon == pytest.approx(-152.1234)

    def test_catalog(self, hypo_files):
        archive, summary = hypo_files
        cat = read_hypoinverse_catalog(archive, summary)
        assert len(cat) == 2
        ev = cat.events[0]
        assert ev.event_id == "1001"
        assert ev.source_type == "lp"
        assert ev.origin.latitude == pytest.approx(61.2345, abs=1e-3)
        assert ev.origin.longitude == pytest.approx(-152.1234, abs=1e-3)
        assert ev.origin.depth_km == pytest.approx(3.21, abs=0.01)
        assert ev.origin.horizontal_error_km == pytest.approx(1.23)
        # picks: AAAA has P@03:04 + 7.89s and S; BBBB only P
        picks = ev.picks
        assert len(picks) == 3
        p0 = picks[0]
        assert p0.station == "AAAA" and p0.phase == "P"
        assert p0.time.isoformat().startswith("2020-01-02T03:04:07.89")
        assert p0.first_motion == "U"
        assert p0.weight == pytest.approx(1.0)

    def test_to_dataframe(self, hypo_files):
        archive, summary = hypo_files
        cat = read_hypoinverse_catalog(archive, summary)
        df = cat.to_dataframe()
        assert {"source_id", "trace_p_arrival_time", "trace_s_arrival_time",
                "trace_p_max_weight", "source_type"} <= set(df.columns)
        row = df[(df["source_id"] == "1001") & (df["station_code"] == "AAAA")].iloc[0]
        assert row["trace_p_arrival_time"].startswith("2020-01-02T03:04:07.89")
        assert row["trace_s_arrival_time"].startswith("2020-01-02T03:04:09.5")

    def test_weighted_average_picks(self):
        t0 = UTC("2020-01-01T00:00:00")
        ev = Event(
            "e1",
            Origin(t0, 60.0, -150.0, 5.0),
            Magnitude(1.0, "ml"),
            "vt",
            picks=[
                PhasePick("AV", "STA1", "", "BHZ", t0 + 10.0, "P", weight=1.0),
                PhasePick("AV", "STA1", "", "BHZ", t0 + 12.0, "P", weight=3.0),
            ],
        )
        df = Catalog([ev]).to_dataframe()
        # weighted average: (10*1 + 12*3)/4 = 11.5
        assert df.iloc[0]["trace_p_arrival_time"].startswith("2020-01-01T00:00:11.5")
        assert df.iloc[0]["trace_p_max_weight"] == 3.0


class TestDownloadLogic:
    def test_event_end(self):
        row = {
            "trace_p_arrival_time": "2020-01-01T00:00:10",
            "trace_s_arrival_time": "2020-01-01T00:00:20",
            "source_origin_time": "2020-01-01T00:00:00",
        }
        end = conservative_event_end(row)
        assert end == pytest.approx(UTC("2020-01-01T00:00:10").timestamp + 50 + 60)

    def test_noise_table(self):
        rows = []
        base = UTC("2020-01-01T00:00:00").timestamp
        gaps = [3600 * 48, 3600 * 2, 3600 * 30]  # two qualifying gaps (>24h)
        t = base
        for i, gap in enumerate(gaps + [0]):
            rows.append(
                {
                    "station_network_code": "AV",
                    "station_code": "STA1",
                    "station_location_code": "",
                    "trace_channel": "BH",
                    "source_origin_time": UTC(t).isoformat(),
                    "trace_p_arrival_time": UTC(t + 5).isoformat(),
                    "trace_s_arrival_time": UTC(t + 9).isoformat(),
                }
            )
            t += gap + 700  # event_end ≈ origin+5+20+60
        df = create_noise_table(pd.DataFrame(rows), time_difference_limit=3600 * 24)
        assert len(df) == 2
        assert (df["forward_event_time_difference"] > 3600 * 24).all()
        # sorted by gap size descending
        assert df.iloc[0]["forward_event_time_difference"] >= df.iloc[1]["forward_event_time_difference"]

    def test_retry_filter(self):
        log = pd.DataFrame(
            {"trace_name": ["a", "b", "c", "d"],
             "error": ["FDSNNoDataException", "ConnectionError", "", "Timeout"]}
        )
        retry = filter_failed_downloads(log)
        assert list(retry["trace_name"]) == ["b", "d"]


class TestConverter:
    def _make_stream(self, rng, p_off=30.0, s_off=33.0, n=6000, t0=None):
        t0 = t0 or UTC("2021-05-01T10:00:00")
        t = np.arange(n) / 100.0
        data = rng.normal(size=(3, n)) * 0.1
        data[0] += np.sin(2 * np.pi * 8 * t) * np.exp(-(((t - p_off)) ** 2)) * 3
        return Stream(
            [
                Trace(data[i], dict(network="AV", station="TST", channel=f"BH{c}",
                                    sampling_rate=100.0, starttime=t0))
                for i, c in enumerate("ZNE")
            ]
        ), t0

    def test_stream_to_array(self, rng):
        st, t0 = self._make_stream(rng)
        start, data, completeness = stream_to_array(st, "ZNE")
        assert data.shape == (3, 6000)
        assert completeness == pytest.approx(1.0)
        np.testing.assert_allclose(data.mean(axis=1), 0, atol=1e-9)

    def test_spikes(self, rng):
        clean = rng.normal(size=(3, 1000))
        assert not trace_has_spikes(clean)
        spiky = clean.copy()
        spiky[1, 500] = 1e6
        assert trace_has_spikes(spiky)

    def test_convert_end_to_end(self, tmp_path, rng):
        streams = {}
        rows = []
        for i in range(4):
            st, t0 = self._make_stream(rng)
            name = f"ev{i}_AV.TST"
            streams[name] = st
            rows.append(
                {
                    "source_id": f"ev{i}",
                    "source_origin_time": (t0 + 1.0).isoformat(),
                    "source_latitude_deg": 60.0,
                    "source_longitude_deg": -150.0,
                    "source_depth_km": 4.0,
                    "source_magnitude": 1.0,
                    "source_magnitude_type": "ml",
                    "source_type": "lp" if i % 2 else "vt",
                    "station_network_code": "AV",
                    "station_code": "TST",
                    "station_location_code": "",
                    "trace_channel": "BH",
                    "trace_p_arrival_time": (t0 + 30.0).isoformat(),
                    "trace_s_arrival_time": (t0 + 33.0).isoformat(),
                    "trace_name": name,
                }
            )
        convert_catalog_to_dataset(
            pd.DataFrame(rows), lambda name: streams[name], tmp_path / "ds", seed=1
        )
        from volpick_tpu.data import WaveformDataset

        ds = WaveformDataset(tmp_path / "ds")
        assert len(ds) == 4
        md = ds.metadata
        assert (md["trace_p_arrival_sample"] == 3000).all()
        assert (md["trace_s_arrival_sample"] == 3300).all()
        assert md["trace_mean_snr_db"].notna().all()
        assert "source_frequency_index" in md.columns
        data = ds.get_waveforms(0)
        assert data.shape == (3, 6000)


class TestRotation:
    def test_rotate_identity(self, rng):
        from volpick_tpu.core.rotate import rotate_to_zne
        from volpick_tpu.core.stream import Stream, Trace, UTC

        data = rng.normal(size=(3, 500))
        hdr = dict(network="XX", station="ROT", sampling_rate=100.0, starttime=UTC(0))
        st = Stream([
            Trace(data[0], dict(hdr, channel="BHZ")),
            Trace(data[1], dict(hdr, channel="BHN")),
            Trace(data[2], dict(hdr, channel="BHE")),
        ])
        ori = {"BHZ": (0.0, -90.0), "BHN": (0.0, 0.0), "BHE": (90.0, 0.0)}
        out = rotate_to_zne(st, ori)
        for comp, ref in zip("ZNE", data):
            got = out.select(channel=f"BH{comp}")[0].data
            np.testing.assert_allclose(got, ref, atol=1e-10)

    def test_rotate_12_channels(self, rng):
        from volpick_tpu.core.rotate import rotate_to_zne
        from volpick_tpu.core.stream import Stream, Trace, UTC

        # true ZNE motion, recorded on BH1 az=30, BH2 az=120, BHZ vertical
        zne = rng.normal(size=(3, 400))
        az1, az2 = np.deg2rad(30.0), np.deg2rad(120.0)
        bh1 = zne[1] * np.cos(az1) + zne[2] * np.sin(az1)
        bh2 = zne[1] * np.cos(az2) + zne[2] * np.sin(az2)
        bhz = zne[0]
        hdr = dict(network="XX", station="R12", sampling_rate=100.0, starttime=UTC(0))
        st = Stream([
            Trace(bhz, dict(hdr, channel="BHZ")),
            Trace(bh1, dict(hdr, channel="BH1")),
            Trace(bh2, dict(hdr, channel="BH2")),
        ])
        out = rotate_to_zne(st, {"BHZ": (0, -90.0), "BH1": (30.0, 0.0), "BH2": (120.0, 0.0)})
        np.testing.assert_allclose(out.select(channel="BHZ")[0].data, zne[0], atol=1e-9)
        np.testing.assert_allclose(out.select(channel="BHN")[0].data, zne[1], atol=1e-9)
        np.testing.assert_allclose(out.select(channel="BHE")[0].data, zne[2], atol=1e-9)

    def test_rotate_degenerate_raises(self, rng):
        from volpick_tpu.core.rotate import rotate_to_zne
        from volpick_tpu.core.stream import Stream, Trace, UTC

        hdr = dict(network="XX", station="BAD", sampling_rate=100.0, starttime=UTC(0))
        st = Stream([Trace(rng.normal(size=100), dict(hdr, channel=c)) for c in ("BH1", "BH2", "BH3")])
        with pytest.raises(ValueError):
            rotate_to_zne(st, {"BH1": (0, 0), "BH2": (0, 0), "BH3": (90, 0)})
