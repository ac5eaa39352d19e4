"""Native Hi-net downloader: wire-format parsing, the reference's event
selection semantics (`volpick/data/data.py:96-161`), and the fake-wire
end-to-end loop (search → select → request → download → extract → native
win32 → mseed conversion)."""

import io
import zipfile
from datetime import datetime

import numpy as np
import pandas as pd
import pytest

from volpick_tpu.acquisition.hinet_net import (
    UNKNOWN_MAGNITUDE,
    HinetEvent,
    HinetSession,
    great_circle_degrees,
    parse_event_rows,
    point_inside_box,
    point_inside_circular,
)


def ev(origin, mag=4.0, lat=35.0, lon=139.0, depth=10.0):
    return HinetEvent(origin=origin, latitude=lat, longitude=lon, depth=depth,
                      magnitude=mag)


class TestWireFormat:
    def test_parse_json(self):
        text = ('[{"origin": "20200101120000", "latitude": 35.1, "longitude": 139.2,'
                ' "depth": 12.5, "magnitude": 4.2, "name": "CHIBA"},'
                ' {"origin": "20200101130000", "latitude": 36.0, "longitude": 140.0,'
                ' "depth": 5.0, "magnitude": null}]')
        events = parse_event_rows(text)
        assert len(events) == 2
        assert events[0].origin == datetime(2020, 1, 1, 12, 0, 0)
        assert events[0].name == "CHIBA"
        assert events[1].magnitude == UNKNOWN_MAGNITUDE

    def test_parse_csv_lines(self):
        text = ("origin,lat,lon,depth,mag\n"
                "20200101120000,35.1,139.2,12.5,4.2,CHIBA\n"
                "\n"
                "20200101130000,36.0,140.0,5.0,-\n")
        events = parse_event_rows(text)
        assert len(events) == 2
        assert events[0].magnitude == 4.2
        assert events[1].magnitude == UNKNOWN_MAGNITUDE

    def test_parse_empty(self):
        assert parse_event_rows("") == []


class TestGeometry:
    def test_box(self):
        assert point_inside_box(35.0, 139.0, minlatitude=34.0, maxlatitude=36.0)
        assert not point_inside_box(35.0, 139.0, maxlongitude=138.0)
        assert point_inside_box(35.0, 139.0)  # no bounds

    def test_circular_degrees(self):
        # 1 degree of latitude is 1 degree of central angle
        assert great_circle_degrees(35.0, 139.0, 36.0, 139.0) == pytest.approx(1.0, abs=1e-6)
        assert point_inside_circular(35.0, 139.0, 35.5, 139.0, maxradius=1.0)
        assert not point_inside_circular(35.0, 139.0, 37.0, 139.0, maxradius=1.0)
        assert not point_inside_circular(35.0, 139.0, 35.1, 139.0, minradius=0.5)


class TestSelection:
    """Reference `HinetClient2.get_event_waveform` selection, data.py:96-161."""

    def setup_method(self):
        self.session = HinetSession.__new__(HinetSession)  # selection is pure

    def test_time_and_magnitude(self):
        t0, t1 = datetime(2020, 1, 1, 6), datetime(2020, 1, 1, 18)
        events = [
            ev(datetime(2020, 1, 1, 3)),               # before window
            ev(datetime(2020, 1, 1, 12), mag=4.0),     # kept
            ev(datetime(2020, 1, 1, 13), mag=2.0),     # below minmagnitude
            ev(datetime(2020, 1, 1, 14), mag=UNKNOWN_MAGNITUDE),  # unknown passes
            ev(datetime(2020, 1, 1, 23)),              # after window
        ]
        sel = self.session.select_events(events, t0, t1, minmagnitude=3.0, maxmagnitude=9.9)
        assert [e.origin.hour for e in sel] == [12, 14]

    def test_depth_box_radius(self):
        t0, t1 = datetime(2020, 1, 1), datetime(2020, 1, 2)
        events = [
            ev(datetime(2020, 1, 1, 1), depth=100.0),            # too deep
            ev(datetime(2020, 1, 1, 2), lat=40.0),               # outside box
            ev(datetime(2020, 1, 1, 3), lat=35.0, lon=139.0),    # kept
            ev(datetime(2020, 1, 1, 4), lat=35.9, lon=139.0),    # outside radius
        ]
        sel = self.session.select_events(
            events, t0, t1, maxdepth=50.0,
            minlatitude=34.0, maxlatitude=36.0,
            latitude=35.0, longitude=139.0, maxradius=0.5,
        )
        assert [e.origin.hour for e in sel] == [3]


def _win32_zip_blob(rng, t0):
    """Zip bytes holding a real win32 archive + channel table (built with the
    in-repo writer) for station VOLA, 3 components, 120 s at 100 Hz."""
    from volpick_tpu.core.stream import Stream, Trace, UTC
    from volpick_tpu.io.win32 import write_win32

    trs = []
    for k, comp in enumerate(("U0", "N0", "E0")):
        steps = rng.integers(-4, 5, 12000).astype(np.int64)
        steps[6000:6200] += rng.integers(-300, 300, 200)
        tr = Trace(
            np.cumsum(steps).astype(np.float64),
            dict(network="N", station="VOLA", location="", channel=comp,
                 sampling_rate=100.0, starttime=UTC(t0)),
        )
        trs.append(tr)
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        cnt = Path(d) / "data.cnt"
        write_win32(Stream(trs), cnt,
                    chan_ids={tr.id: 0x200 + k for k, tr in enumerate(trs)})
        table = "\n".join(
            f"{0x200 + k:04X} 1 0 VOLA {comp} 1 27 1.0 m/s 1.0 0.7 0.0 1.0"
            for k, comp in enumerate(("U", "N", "E"))
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("event/data.cnt", cnt.read_bytes())
            zf.writestr("event/table.ch", table)
        return buf.getvalue()


class FakeWire:
    """Offline stand-in for UrllibWire: two days of events, one of which
    fails at the download step."""

    def __init__(self, events_by_day, blobs, fail_ids=()):
        self.events_by_day = events_by_day
        self.blobs = blobs
        self.fail_ids = set(fail_ids)
        self.calls = []

    def login(self):
        self.calls.append("login")

    def search_events(self, day, **kwargs):
        self.calls.append(("search", day))
        return self.events_by_day.get(day, [])

    def request_event(self, event, span_minutes):
        self.calls.append(("request", event.origin))
        return event.origin.strftime("%Y%m%d%H%M%S")

    def download_event(self, request_id):
        self.calls.append(("download", request_id))
        if request_id in self.fail_ids:
            raise RuntimeError("portal error page")
        return self.blobs[request_id]


class TestEndToEnd:
    def test_download_extract_convert(self, tmp_path, rng):
        from datetime import date

        from volpick_tpu.acquisition.hinet import convert_win32_event_dirs
        from volpick_tpu.core.stream import UTC
        from volpick_tpu.io.miniseed import read_mseed

        # two events on two days; the second day's event fails to download
        t_ok = datetime(2020, 1, 1, 12, 0, 0)
        t_bad = datetime(2020, 1, 2, 6, 0, 0)
        ts_ok = UTC(t_ok.strftime("%Y-%m-%dT%H:%M:%S")).timestamp
        blob = _win32_zip_blob(rng, ts_ok)
        rid_ok = t_ok.strftime("%Y%m%d%H%M%S")
        rid_bad = t_bad.strftime("%Y%m%d%H%M%S")
        wire = FakeWire(
            events_by_day={
                date(2020, 1, 1): [ev(t_ok)],
                date(2020, 1, 2): [ev(t_bad)],
            },
            blobs={rid_ok: blob},
            fail_ids={rid_bad},
        )
        session = HinetSession(wire, tmp_path / "japan")
        dirs = session.get_event_waveform(
            datetime(2020, 1, 1), datetime(2020, 1, 3), minmagnitude=3.0
        )
        # the failing event is logged, not raised
        assert [d.name for d in dirs] == [rid_ok]
        log = pd.read_csv(tmp_path / "japan" / "hinet_event_log.csv")
        assert len(log) == 2
        assert log.loc[log["origin"] == int(rid_bad), "error"].item() == "RuntimeError"
        assert (tmp_path / "japan" / rid_ok / "data.cnt").exists()
        assert (tmp_path / "japan" / rid_ok / "table.ch").exists()

        # the extracted directory feeds the native win32→mseed conversion
        catalog = pd.DataFrame([{
            "source_id": rid_ok,
            "source_origin_time": UTC(ts_ok + 30.0).isoformat(),
            "station_network_code": "N",
            "station_code": "VOLA",
            "trace_p_arrival_time": UTC(ts_ok + 60.0).isoformat(),
            "trace_s_arrival_time": UTC(ts_ok + 64.0).isoformat(),
            "trace_name": f"{rid_ok}_N.VOLA",
        }])
        conv = convert_win32_event_dirs(tmp_path / "japan", catalog)
        assert (conv["error"] == "").all(), conv
        st = read_mseed(tmp_path / "japan" / "mseed" / f"{rid_ok}_N.VOLA.mseed")
        assert {tr.stats.channel for tr in st} == {"Z", "N", "E"}


class TestUnifiedCatalog:
    def test_download_strides_and_relogin(self, tmp_path):
        from volpick_tpu.acquisition.hinet_net import (
            check_jma_unified_catalog,
            download_jma_unified_catalog,
        )

        class Wire:
            def __init__(self):
                self.calls = []

            def login(self):
                self.calls.append("login")

            def get_arrivaltime(self, start, span_days):
                self.calls.append(("cat", start, span_days))
                if start.day == 15:  # one bad leg: HTML error page
                    return b"<!DOCTYPE html>\n<html>error</html>\n"
                return b"line1\nline2\n"

        # fake clock: each call advances 400 s -> relogin fires mid-run
        t = [0.0]

        def clock():
            t[0] += 400.0
            return t[0]

        wire = Wire()
        paths = download_jma_unified_catalog(
            wire, tmp_path, datetime(2020, 1, 1), datetime(2020, 1, 31), clock=clock
        )
        # 7-day strides: 1, 8, 15, 22 (29 > 31-6 stops)
        assert [p.name for p in paths] == [
            "cat_20200101_20200107", "cat_20200108_20200114",
            "cat_20200115_20200121", "cat_20200122_20200128",
        ]
        assert "login" in wire.calls  # periodic re-login happened
        bad = check_jma_unified_catalog(tmp_path)
        assert [p.name for p in bad] == ["cat_20200115_20200121"]
