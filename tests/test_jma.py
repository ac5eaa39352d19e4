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


def test_negative_magnitude_codes(tmp_path):
    """JMA A/B codes: 'A5' → -1.5, 'B2' → -2.2 (reference `data.py:620-629`
    replace A→-1, B→-2 then /10)."""
    f = tmp_path / "neg.txt"
    line = make_hypo_line()
    for code, want in (("A5", -1.5), ("B2", -2.2)):
        s = line[:52] + code + line[54:]
        with open(f, "w") as fh:
            fh.write(s + "\n")
            fh.write(make_arrival_line() + "\n")
            fh.write("E\n")
        cat, _ = read_jma_catalog(f)
        assert cat.events[0].magnitude.mag == pytest.approx(want)


def test_shallow_depth_format(tmp_path):
    """Depth written as 3 digits + 2 blanks is integer km (deck format F3.2
    vs I3 variants, reference `data.py:584-591`)."""
    line = make_hypo_line()
    s = line[:44] + "  7  " + line[49:]
    f = tmp_path / "dep.txt"
    with open(f, "w") as fh:
        fh.write(s + "\n")
        fh.write(make_arrival_line() + "\n")
        fh.write("E\n")
    cat, _ = read_jma_catalog(f)
    assert cat.events[0].origin.depth_km == pytest.approx(7.0)


def test_secondless_arrival_skipped(tmp_path):
    """An arrival line with blank time digits is logged, not crashed on."""
    f = tmp_path / "blank.txt"
    bad = make_arrival_line()
    bad = bad[:19] + "  " + bad[21:]  # blank hour field -> unparseable time
    with open(f, "w") as fh:
        fh.write(make_hypo_line() + "\n")
        fh.write(bad + "\n")
        fh.write(make_arrival_line(sta="GOOD") + "\n")
        fh.write("E\n")
    cat, skipped = read_jma_catalog(f)
    assert len(cat) == 1
    assert {p.station for p in cat.events[0].picks} == {"GOOD"}
    assert any(s["remark"] == "bad arrival time" for s in skipped)


def test_unknown_second_phase_logged(tmp_path):
    """'M' (max-amplitude) second records keep the P pick and log the skip
    (reference `data.py:760-774`)."""
    f = tmp_path / "m2.txt"
    line = make_arrival_line()
    line = line[:27] + _pad("M", 4) + line[31:]
    with open(f, "w") as fh:
        fh.write(make_hypo_line() + "\n")
        fh.write(line + "\n")
        fh.write("E\n")
    cat, skipped = read_jma_catalog(f)
    assert len(cat.events[0].picks) == 1
    assert cat.events[0].picks[0].phase == "P"
    assert any("unknown phase M" in s["remark"] for s in skipped)


def test_multi_file_dir(tmp_path):
    """Monthly deck files in one directory merge in name order (the
    reference's read_catalog_multiple_files, `data.py:413-504`)."""
    from volpick_tpu.acquisition.jma import read_jma_catalog_dir

    d = tmp_path / "decks"
    d.mkdir()
    for m in (1, 2, 3):
        with open(d / f"d2019{m:02d}", "w") as fh:
            fh.write(make_hypo_line(month=m) + "\n")
            fh.write(make_arrival_line(mon=f"{m:02d}") + "\n")
            fh.write("E\n")
    cat, skipped = read_jma_catalog_dir(d, id_prefix="jma")
    assert len(cat) == 3
    months = [ev.origin.time.datetime.month for ev in cat.events]
    assert months == [1, 2, 3]
    assert all(ev.event_id.startswith("jmaJ") for ev in cat.events)


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
