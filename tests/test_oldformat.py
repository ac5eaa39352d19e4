"""convert_from_old_format + geodesy + StationXML tests (reference
`volpick/data/convert.py:306-458`)."""

import numpy as np
import pandas as pd
import pytest

from volpick_tpu.core.geo import gps2dist_azimuth
from volpick_tpu.core.stream import Stream, Trace, UTC


class TestGeodesy:
    def test_equator_degree(self):
        d, az, baz = gps2dist_azimuth(0.0, 0.0, 0.0, 1.0)
        assert d == pytest.approx(111319.4908, abs=0.01)
        assert az == pytest.approx(90.0, abs=1e-6)
        assert baz == pytest.approx(270.0, abs=1e-6)

    def test_meridian_degree(self):
        d, az, baz = gps2dist_azimuth(0.0, 0.0, 1.0, 0.0)
        assert d == pytest.approx(110574.39, abs=1.0)
        assert az == pytest.approx(0.0, abs=1e-6)
        assert baz == pytest.approx(180.0, abs=1e-6)

    def test_vincenty_classic_vector(self):
        # Flinders Peak → Buninyong (Geoscience Australia test line)
        d, az, baz = gps2dist_azimuth(
            -37.95103342, 144.42486789, -37.65282114, 143.92649553
        )
        assert d == pytest.approx(54972.271, abs=0.01)
        assert az == pytest.approx(306.868158, abs=1e-4)
        assert baz == pytest.approx(127.173631, abs=1e-4)

    def test_identical_points(self):
        assert gps2dist_azimuth(10.0, 20.0, 10.0, 20.0) == (0.0, 0.0, 0.0)


STATIONXML = """<?xml version="1.0" encoding="UTF-8"?>
<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" schemaVersion="1.1">
  <Network code="AV">
    <Station code="SPBG">
      <Latitude>61.25</Latitude>
      <Longitude>-152.15</Longitude>
      <Elevation>800.0</Elevation>
      <Channel code="BH1" locationCode="">
        <Azimuth>30.0</Azimuth>
        <Dip>0.0</Dip>
      </Channel>
      <Channel code="BH2" locationCode="">
        <Azimuth>120.0</Azimuth>
        <Dip>0.0</Dip>
      </Channel>
      <Channel code="BHZ" locationCode="">
        <Azimuth>0.0</Azimuth>
        <Dip>-90.0</Dip>
      </Channel>
    </Station>
  </Network>
</FDSNStationXML>
"""


class TestStationXML:
    def test_parse(self, tmp_path):
        from volpick_tpu.io.stationxml import channel_orientations, read_stationxml

        (tmp_path / "s.xml").write_text(STATIONXML)
        inv = read_stationxml(tmp_path / "s.xml")
        assert inv["coords"]["AV.SPBG"] == (61.25, -152.15, 800.0)
        ori = channel_orientations(inv, "AV", "SPBG")
        assert ori == {"BH1": (30.0, 0.0), "BH2": (120.0, 0.0), "BHZ": (0.0, -90.0)}


class TestConvertFromOldFormat:
    def _make_event_dir(self, root, evid, rng, rotated=True):
        ev = root / evid
        ev.mkdir(parents=True)
        pd.DataFrame(
            [{
                "event_id": evid, "origin_time": "2020-01-01T00:00:00",
                "hypo_lat": 61.3, "hypo_lon": -152.2, "hypo_depth": 3.0,
                "magnitude": 1.8, "event_type": "lp",
            }]
        ).to_csv(ev / "event_info.csv")

        t0 = UTC("2020-01-01T00:00:30")
        n = 6000
        zne = rng.normal(size=(3, n)) * 10
        hdr = dict(network="AV", station="SPBG", location="", sampling_rate=100.0,
                   starttime=t0)
        if rotated:
            chans = ("BHZ", "BHN", "BHE")
            data = zne
        else:
            # write BH1/BH2 at 30/120° so rotation must reconstruct N/E
            chans = ("BHZ", "BH1", "BH2")
            a = np.deg2rad(30.0)
            n_comp, e_comp = zne[1], zne[2]
            data = np.stack([
                zne[0],
                np.cos(a) * n_comp + np.sin(a) * e_comp,
                -np.sin(a) * n_comp + np.cos(a) * e_comp,
            ])
        st = Stream([Trace(data[i], dict(hdr, channel=c)) for i, c in enumerate(chans)])
        from volpick_tpu.io.miniseed import write_mseed

        name = f"{evid}_AV.SPBG.mseed"
        write_mseed(st, ev / name)
        (ev / name.replace("mseed", "xml")).write_text(STATIONXML)
        pd.DataFrame(
            [{
                "network": "AV", "station": "SPBG", "instrument": "BH",
                "latitude": 61.25, "longitude": -152.15, "elevation_m": 800.0,
                "p_time": (t0 + 20.0).isoformat(), "s_time": (t0 + 24.0).isoformat(),
                "first_motion": "U",
            }],
            index=[name],
        ).to_csv(ev / "picks.csv")
        return zne

    def test_end_to_end(self, tmp_path, rng):
        from volpick_tpu.acquisition.convert import convert_from_old_format
        from volpick_tpu.data import WaveformDataset

        src = tmp_path / "old"
        self._make_event_dir(src, "ev001", rng, rotated=True)
        zne2 = self._make_event_dir(src, "ev002", rng, rotated=False)
        convert_from_old_format(src, tmp_path / "ds", split_prob=(1.0, 0.0, 0.0), seed=7)

        ds = WaveformDataset(tmp_path / "ds")
        assert len(ds) == 2
        md = ds.metadata
        assert (md["trace_p_arrival_sample"] == 2000).all()
        assert (md["trace_s_arrival_sample"] == 2400).all()
        assert (md["trace_p_status"] == "USGS").all()
        assert md["trace_frequency_index"].notna().all()
        assert md["source_frequency_index"].notna().all()
        assert (md["split"] == "train").all()
        # back-azimuth from the Vincenty helper is populated
        assert md["path_back_azimuth_deg"].notna().all()
        # the BH1/BH2 event was rotated back to true N/E (demeaned by
        # stream_to_array, so compare demeaned)
        i2 = int(np.where(md["source_id"] == "ev002")[0][0])
        got = ds.get_waveforms(i2)
        want = zne2 - zne2.mean(axis=1, keepdims=True)
        np.testing.assert_allclose(got[1], want[1], atol=1e-3)
        np.testing.assert_allclose(got[2], want[2], atol=1e-3)
