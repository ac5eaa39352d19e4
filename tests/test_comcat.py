"""ComCat phase-download tests with a fake libcomcat-style client
(reference `volpick/data/data.py:4002-4180`)."""

import numpy as np
import pandas as pd
import pytest

from volpick_tpu.acquisition.comcat import (
    download_phases,
    group_comcat_picks,
    read_PNSN_events,
)


def phase_frame(rows):
    return pd.DataFrame(rows, columns=["Channel", "Phase", "Arrival Time", "Status", "Weight"])


class TestGroupComcatPicks:
    def test_weighted_average_and_max_weight(self):
        t0 = "2020-01-01T00:00:"
        ph = phase_frame([
            ("UW.ABC.EHZ.01", "P", t0 + "10.0", "manual", 1.0),
            ("UW.ABC.EHZ.01", "P", t0 + "14.0", "manual", 3.0),
            ("UW.ABC.EHN.01", "S", t0 + "20.0", "automatic", 2.0),
        ])
        g = group_comcat_picks(ph)
        # EHZ and EHN share the channel-group key "UW.ABC.EH"
        assert set(g) == {"UW.ABC.EH"}
        got = g["UW.ABC.EH"]
        # weighted avg: (10*1 + 14*3)/4 = 13
        assert got["trace_p_arrival_time"].endswith("13.000000Z")
        assert got["trace_p_max_weight"] == 3.0
        assert got["trace_s_arrival_time"].endswith("20.000000Z")
        assert got["trace_p_status"] == "manual"
        assert got["trace_s_status"] == "automatic"
        assert got["station_location_code"] == "01"
        assert got["trace_p_first_motion"] is None

    def test_zero_weights_fall_back_to_plain_average(self):
        ph = phase_frame([
            ("UW.X.HHZ.", "P", "2020-01-01T00:00:10", "manual", 0.0),
            ("UW.X.HHZ.", "P", "2020-01-01T00:00:12", "manual", 0.0),
        ])
        got = group_comcat_picks(ph)["UW.X.HH"]
        assert got["trace_p_arrival_time"].endswith("11.000000Z")
        assert got["station_location_code"] == "--"  # empty loc convention
        assert got["trace_p_max_weight"] == 0.0

    def test_nan_weights(self):
        # all NaN → plain average, max weight NaN
        ph = phase_frame([
            ("UW.Y.BHZ.", "P", "2020-01-01T00:00:10", "m", np.nan),
            ("UW.Y.BHZ.", "P", "2020-01-01T00:00:20", "m", np.nan),
        ])
        got = group_comcat_picks(ph)["UW.Y.BH"]
        assert got["trace_p_arrival_time"].endswith("15.000000Z")
        assert np.isnan(got["trace_p_max_weight"])
        # mixed NaN/positive → NaN-weighted picks dropped from the average
        ph2 = phase_frame([
            ("UW.Y.BHZ.", "P", "2020-01-01T00:00:10", "m", np.nan),
            ("UW.Y.BHZ.", "P", "2020-01-01T00:00:20", "m", 2.0),
        ])
        got2 = group_comcat_picks(ph2)["UW.Y.BH"]
        assert got2["trace_p_arrival_time"].endswith("20.000000Z")
        assert got2["trace_p_max_weight"] == 2.0

    def test_missing_phase_is_none(self):
        ph = phase_frame([("UW.Z.ENZ.", "P", "2020-01-01T00:00:10", "m", 1.0)])
        got = group_comcat_picks(ph)["UW.Z.EN"]
        assert got["trace_s_arrival_time"] is None
        assert got["trace_s_max_weight"] is None


class FakeDetail:
    def __init__(self, source_id, magnitude=2.5, magtype="ml"):
        self.id = source_id
        self._d = {"magnitude": magnitude, "magtype": magtype}

    def toDict(self):
        return self._d


class FakeClient:
    """libcomcat-shaped client backed by in-memory tables."""

    def __init__(self, phases, missing=(), no_arrivals=()):
        self.phases = phases
        self.missing = set(missing)
        self.no_arrivals = set(no_arrivals)
        self.calls = []

    def get_event_by_id(self, source_id, includesuperseded=False):
        self.calls.append(source_id)
        if source_id in self.missing:
            raise LookupError(source_id)
        return FakeDetail(source_id)

    def get_phase_dataframe(self, detail):
        if detail.id in self.no_arrivals:
            raise KeyError("Arrival Time")
        return self.phases[detail.id].copy()


def summary(ids):
    return pd.DataFrame({
        "id": ids,
        "time": ["2020-02-03T04:05:06"] * len(ids),
        "latitude": [46.2] * len(ids),
        "longitude": [-122.18] * len(ids),
        "depth": [1.5] * len(ids),
        "eventtype": ["lp"] * len(ids),
    })


class TestDownloadPhases:
    def test_end_to_end(self, tmp_path):
        phases = {
            "uw100": phase_frame([
                ("UW.AAA.EHZ.", "Pn", "2020-02-03T04:05:16", "manual", 1.0),
                ("UW.AAA.EHZ.", "Sg", "2020-02-03T04:05:20", "manual", 1.0),
                ("CC.BBB.BHZ.01", "P", "2020-02-03T04:05:17", "automatic", 0.5),
            ]),
            "uw101": phase_frame([
                ("UW.CCC.HHZ.", "P", "2020-02-03T04:05:18", "manual", 2.0),
            ]),
        }
        client = FakeClient(phases, missing={"uw102"}, no_arrivals={"uw103"})
        df = download_phases(summary(["uw100", "uw101", "uw102", "uw103"]),
                             client, tmp_path)
        # uw100 → 2 station rows; uw101 → 1; the bad pair skipped
        assert len(df) == 3
        assert set(df["source_id"]) == {"uw100", "uw101"}
        aaa = df[df["station_code"] == "AAA"].iloc[0]
        # Pn/Sg aliases folded into P/S
        assert aaa["trace_p_arrival_time"].endswith("16.000000Z")
        assert aaa["trace_s_arrival_time"].endswith("20.000000Z")
        assert aaa["source_magnitude"] == 2.5
        # artifacts on disk
        assert (tmp_path / "phases.csv").exists()
        skipped = pd.read_csv(tmp_path / "events_without_picks.csv")
        assert list(skipped["id"]) == ["uw102", "uw103"]

    def test_pnsn_reader(self, tmp_path):
        (tmp_path / "pnsn.csv").write_text(
            "Evid,Magnitude,Magnitude Type,Epoch(UTC),Time UTC,Time Local,Distance From,Lat,Lon,Depth Km,Depth Mi\n"
            "61569752,1.2,l,1581724619.6,2020/02/14 23:56:59,,\"x\",46.2,-122.18,1.5,0.9\n"
        )
        df = read_PNSN_events(tmp_path / "pnsn.csv", "lp")
        assert list(df["id"]) == ["uw61569752"]
        assert df.iloc[0]["eventtype"] == "lp"
        assert df.iloc[0]["latitude"] == 46.2
        assert "time" in df.columns and "depth" in df.columns
