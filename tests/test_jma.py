"""JMA deck-format parser test with a synthetic fixture."""

import pytest

from volpick_tpu.acquisition.jma import read_jma_catalog


def _pad(s, n):
    return (s + " " * n)[:n]


def make_hypo_line(year=2019, month=3, day=15, hh=12, mm=34, sec=56.78,
                   lat=34.5, lon=139.2, dep_km=8.5, mag=2.3, etype="5"):
    s = "J"
    s += f"{year:04d}{month:02d}{day:02d}{hh:02d}{mm:02d}{int(sec):02d}{int(round(sec % 1 * 100)):02d}"
    s = _pad(s, 21)
    lat_deg = int(lat)
    lat_min = (lat - lat_deg) * 60
    s += f"{lat_deg:3d}{int(round(lat_min * 100)):4d}"
    s = _pad(s, 32)
    lon_deg = int(lon)
    lon_min = (lon - lon_deg) * 60
    s += f"{lon_deg:4d}{int(round(lon_min * 100)):4d}"
    s = _pad(s, 44)
    s += f"{int(round(dep_km * 100)):5d}"
    s = _pad(s, 52)
    s += f"{int(round(mag * 10)):2d}V"
    s = _pad(s, 60)
    s += etype
    return _pad(s, 96)


def make_arrival_line(sta="ASAMA", day=15, p_hr=12, p_min=35, p_sec=1.23,
                      s_min=35, s_sec=4.56, year2="19", mon="03"):
    s = "_" + _pad(sta, 6)
    s = _pad(s, 13)
    s += f"{day:2d}"
    s += _pad("IP", 4)  # [15:19]
    s += f"{p_hr:02d}{p_min:02d}{int(p_sec):02d}{int(round(p_sec % 1 * 100)):02d}"  # [19:27]
    s += _pad("ES", 4)  # [27:31]
    s += f"{s_min:02d}{int(s_sec):02d}{int(round(s_sec % 1 * 100)):02d}"  # [31:37]
    s = _pad(s, 87)
    s += year2 + mon  # [87:91]
    s += "18"  # p/s flags
    return _pad(s, 96)


def test_read_jma(tmp_path):
    f = tmp_path / "jma.txt"
    with open(f, "w") as fh:
        fh.write(make_hypo_line() + "\n")
        fh.write(make_arrival_line() + "\n")
        fh.write("E\n")
        # second event with unknown type → skipped
        fh.write(make_hypo_line(etype="9") + "\n")
        fh.write(make_arrival_line() + "\n")
        fh.write("E\n")
    cat, skipped = read_jma_catalog(f)
    assert len(cat) == 1
    assert len(skipped) == 1
    ev = cat.events[0]
    assert ev.source_type == "lp"
    assert ev.origin.latitude == pytest.approx(34.5, abs=1e-3)
    assert ev.origin.longitude == pytest.approx(139.2, abs=1e-3)
    assert ev.origin.depth_km == pytest.approx(8.5, abs=0.01)
    assert ev.magnitude.mag == pytest.approx(2.3)
    assert len(ev.picks) == 2
    p, s = ev.picks
    assert p.phase == "P" and p.time.isoformat().startswith("2019-03-15T12:35:01.23")
    assert s.phase == "S" and s.time.isoformat().startswith("2019-03-15T12:35:04.56")
    df = cat.to_dataframe()
    assert df.iloc[0]["source_type"] == "lp"
