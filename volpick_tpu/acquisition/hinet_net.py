"""Native NIED Hi-net event-waveform downloader (no HinetPy).

Reference behavior: `volpick/data/data.py:75-175` (``HinetClient2.get_event_waveform``)
— day-by-day event search over the requested time range, then event selection
by origin time, magnitude (with the ``-99.9`` unknown-magnitude sentinel),
depth, box region, and circular region, then a per-event win32
request + download loop returning the list of extracted directories. The
reference delegates the wire protocol to HinetPy; here the orchestration is
native and the wire protocol is an injectable adapter:

- :class:`HinetSession` holds the reference's selection/orchestration logic
  (the part `data.py:75-175` actually implements) plus zip extraction and a
  per-event CSV log, and is fully testable offline with a fake wire
  (``tests/test_acquisition.py``) — the same injectable-client pattern as the
  FDSN (`acquisition/download.py`) and ComCat (`acquisition/comcat.py`)
  layers.
- :class:`UrllibWire` is a stdlib-only (urllib + http.cookiejar) HTTP
  implementation of NIED's authenticated portal exchanges. NIED's portal is
  credential-gated and this container has zero network egress, so the
  endpoint constants and form-field names mirror the public HinetPy client's
  protocol on a best-effort basis and are constructor-overridable; every
  downstream step (win32 decode, channel tables, mseed conversion) is native
  and tested (`volpick_tpu.io.win32`, `acquisition.hinet`).

Geometry helpers replicate ``HinetPy.utils.point_inside_box`` /
``point_inside_circular`` (radii in great-circle degrees).
"""

from __future__ import annotations

import io
import json
import math
import zipfile
from dataclasses import dataclass
from datetime import date, datetime, timedelta
from pathlib import Path
from typing import Callable, List, Optional, Sequence

import pandas as pd

UNKNOWN_MAGNITUDE = -99.9  # NIED's unknown-magnitude sentinel (data.py:121)


@dataclass
class HinetEvent:
    """One event row from the portal's event search."""

    origin: datetime  # JST naive, as served by the portal
    latitude: float
    longitude: float
    depth: float  # km
    magnitude: float  # UNKNOWN_MAGNITUDE when not determined
    name: str = ""


# ----------------------------------------------------------------- geometry


def point_inside_box(
    latitude: float,
    longitude: float,
    minlatitude: Optional[float] = None,
    maxlatitude: Optional[float] = None,
    minlongitude: Optional[float] = None,
    maxlongitude: Optional[float] = None,
) -> bool:
    """``HinetPy.utils.point_inside_box`` semantics: None bounds pass."""
    if minlatitude is not None and latitude < minlatitude:
        return False
    if maxlatitude is not None and latitude > maxlatitude:
        return False
    if minlongitude is not None and longitude < minlongitude:
        return False
    if maxlongitude is not None and longitude > maxlongitude:
        return False
    return True


def great_circle_degrees(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Central angle between two points in degrees (haversine)."""
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return math.degrees(2 * math.asin(min(1.0, math.sqrt(a))))


def point_inside_circular(
    latitude: float,
    longitude: float,
    center_latitude: float,
    center_longitude: float,
    minradius: Optional[float] = None,
    maxradius: Optional[float] = None,
) -> bool:
    """``HinetPy.utils.point_inside_circular``: radius bounds in degrees."""
    d = great_circle_degrees(latitude, longitude, center_latitude, center_longitude)
    if minradius is not None and d < minradius:
        return False
    if maxradius is not None and d > maxradius:
        return False
    return True


# ---------------------------------------------------------------- wire layer


class UrllibWire:
    """Stdlib HTTP adapter for NIED's authenticated Hi-net portal.

    Cookie-session auth via form POST, then event search / waveform request /
    zip download. Endpoints and form fields follow the public HinetPy
    client's protocol (unverifiable from this zero-egress container — NIED
    requires registered credentials) and are constructor-overridable so a
    deployment can pin whatever the portal serves today.
    """

    BASE = "https://hinetwww11.bosai.go.jp/auth"

    def __init__(
        self,
        user: str,
        password: str,
        base_url: str = BASE,
        timeout: float = 120.0,
        endpoints: Optional[dict] = None,
    ):
        import http.cookiejar
        import urllib.request

        self.base = base_url.rstrip("/")
        self.timeout = timeout
        self.user, self.password = user, password
        self.endpoints = {
            "login": f"{self.base}/login.php",
            "event_search": f"{self.base}/download/event_search.php",
            "event_request": f"{self.base}/download/event_request.php",
            "event_download": f"{self.base}/download/event_download.php",
            **(endpoints or {}),
        }
        self._jar = http.cookiejar.CookieJar()
        self._opener = urllib.request.build_opener(
            urllib.request.HTTPCookieProcessor(self._jar)
        )
        self._logged_in = False

    def _call(self, url: str, data: Optional[dict] = None) -> bytes:
        import urllib.parse
        import urllib.request

        body = urllib.parse.urlencode(data).encode() if data is not None else None
        req = urllib.request.Request(url, data=body)
        with self._opener.open(req, timeout=self.timeout) as resp:
            return resp.read()

    def login(self) -> None:
        out = self._call(
            self.endpoints["login"], {"auth_un": self.user, "auth_pw": self.password}
        )
        if b"auth_un" in out:  # login form echoed back → bad credentials
            raise PermissionError("Hi-net login failed (credentials rejected)")
        self._logged_in = True

    def search_events(
        self,
        day: date,
        region: str = "00",
        magmin: float = 3.0,
        magmax: float = 9.9,
        include_unknown_mag: bool = True,
    ) -> List[HinetEvent]:
        if not self._logged_in:
            self.login()
        raw = self._call(
            self.endpoints["event_search"],
            {
                "date": day.strftime("%Y%m%d"),
                "region": region,
                "magmin": f"{magmin:.1f}",
                "magmax": f"{magmax:.1f}",
                "mag_unknown": "1" if include_unknown_mag else "0",
            },
        )
        return parse_event_rows(raw.decode("utf-8", errors="replace"))

    def request_event(self, event: HinetEvent, span_minutes: int = 5) -> str:
        if not self._logged_in:
            self.login()
        raw = self._call(
            self.endpoints["event_request"],
            {
                "origin": event.origin.strftime("%Y%m%d%H%M%S"),
                "span": str(span_minutes),
            },
        )
        rid = raw.decode().strip()
        if not rid:
            raise RuntimeError(f"empty request id for event {event.origin}")
        return rid

    def download_event(self, request_id: str) -> bytes:
        raw = self._call(
            self.endpoints["event_download"], {"id": request_id}
        )
        if not raw.startswith(b"PK"):  # not a zip → portal error page
            raise RuntimeError(f"request {request_id}: response is not a zip archive")
        return raw

    def get_arrivaltime(self, start: date, span_days: int) -> bytes:
        """JMA unified arrival-time catalog text for [start, start+span_days)
        (HinetPy ``Client.get_arrivaltime``; reference usage data.py:200-225)."""
        if not self._logged_in:
            self.login()
        return self._call(
            self.endpoints.get(
                "arrivaltime", f"{self.base}/JMA/dlDialogue.php"
            ),
            {"data": "measure", "rtm": start.strftime("%Y%m%d"), "span": str(span_days)},
        )


def parse_event_rows(text: str) -> List[HinetEvent]:
    """Parse the portal's event-search response.

    Accepts either a JSON array of objects
    (``[{"origin": "YYYYMMDDhhmmss", "latitude": .., "longitude": ..,
    "depth": .., "magnitude": .., "name": ..}, ...]``) or CSV-ish lines
    ``YYYYMMDDhhmmss,lat,lon,depth,mag[,name]``; unknown magnitude may be
    empty/``-``/``-99.9``. Tolerant of blank lines and a header row.
    """
    text = text.strip()
    events: List[HinetEvent] = []
    if not text:
        return events
    if text[0] in "[{":
        for row in json.loads(text):
            events.append(
                HinetEvent(
                    origin=datetime.strptime(str(row["origin"]), "%Y%m%d%H%M%S"),
                    latitude=float(row["latitude"]),
                    longitude=float(row["longitude"]),
                    depth=float(row["depth"]),
                    magnitude=_parse_mag(row.get("magnitude")),
                    name=str(row.get("name", "")),
                )
            )
        return events
    for line in text.splitlines():
        line = line.strip()
        if not line or not line[0].isdigit():
            continue
        parts = [p.strip() for p in line.split(",")]
        if len(parts) < 5:
            continue
        events.append(
            HinetEvent(
                origin=datetime.strptime(parts[0], "%Y%m%d%H%M%S"),
                latitude=float(parts[1]),
                longitude=float(parts[2]),
                depth=float(parts[3]),
                magnitude=_parse_mag(parts[4]),
                name=parts[5] if len(parts) > 5 else "",
            )
        )
    return events


def _parse_mag(v) -> float:
    if v is None:
        return UNKNOWN_MAGNITUDE
    s = str(v).strip()
    if not s or s == "-":
        return UNKNOWN_MAGNITUDE
    return float(s)


# -------------------------------------------------------------- orchestration


class HinetSession:
    """The reference's ``HinetClient2.get_event_waveform`` orchestration
    (`volpick/data/data.py:75-175`) over an injectable wire.

    ``wire`` needs four methods — ``login()``, ``search_events(day, region,
    magmin, magmax, include_unknown_mag)``, ``request_event(event,
    span_minutes)``, ``download_event(request_id)`` (returning zip bytes) —
    satisfied by :class:`UrllibWire` in production and by a fake in tests.
    """

    def __init__(self, wire, save_dir, span_minutes: int = 5):
        self.wire = wire
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.span_minutes = span_minutes

    # reference selection semantics, data.py:96-161
    def select_events(
        self,
        events: Sequence[HinetEvent],
        starttime: datetime,
        endtime: datetime,
        minmagnitude: float = 3.0,
        maxmagnitude: float = 9.9,
        mindepth: Optional[float] = None,
        maxdepth: Optional[float] = None,
        minlatitude: Optional[float] = None,
        maxlatitude: Optional[float] = None,
        minlongitude: Optional[float] = None,
        maxlongitude: Optional[float] = None,
        latitude: Optional[float] = None,
        longitude: Optional[float] = None,
        minradius: Optional[float] = None,
        maxradius: Optional[float] = None,
    ) -> List[HinetEvent]:
        out = []
        for ev in events:
            if not starttime <= ev.origin <= endtime:
                continue
            # unknown magnitude (sentinel) passes the magnitude filter
            # (reference data.py:121-123)
            if ev.magnitude != UNKNOWN_MAGNITUDE and not (
                minmagnitude <= ev.magnitude <= maxmagnitude
            ):
                continue
            if mindepth is not None and ev.depth < mindepth:
                continue
            if maxdepth is not None and ev.depth > maxdepth:
                continue
            if any(
                v is not None
                for v in (minlatitude, maxlatitude, minlongitude, maxlongitude)
            ) and not point_inside_box(
                ev.latitude,
                ev.longitude,
                minlatitude=minlatitude,
                maxlatitude=maxlatitude,
                minlongitude=minlongitude,
                maxlongitude=maxlongitude,
            ):
                continue
            if (
                latitude is not None
                and longitude is not None
                and (minradius is not None or maxradius is not None)
            ) and not point_inside_circular(
                ev.latitude,
                ev.longitude,
                latitude,
                longitude,
                minradius=minradius,
                maxradius=maxradius,
            ):
                continue
            out.append(ev)
        return out

    def get_event_waveform(
        self,
        starttime: datetime,
        endtime: datetime,
        region: str = "00",
        minmagnitude: float = 3.0,
        maxmagnitude: float = 9.9,
        include_unknown_mag: bool = True,
        **select_kwargs,
    ) -> List[Path]:
        """Day loop + selection + request/download/extract; returns the list
        of extracted event directories (reference data.py:93-175). A per-event
        log (origin, request id, error class) is written to
        ``save_dir/hinet_event_log.csv`` like the FDSN worker logs."""
        events: List[HinetEvent] = []
        for i in range((endtime.date() - starttime.date()).days + 1):
            day = starttime.date() + timedelta(days=i)
            events.extend(
                self.wire.search_events(
                    day,
                    region=region,
                    magmin=minmagnitude,
                    magmax=maxmagnitude,
                    include_unknown_mag=include_unknown_mag,
                )
            )
        selected = self.select_events(
            events,
            starttime,
            endtime,
            minmagnitude=minmagnitude,
            maxmagnitude=maxmagnitude,
            **select_kwargs,
        )
        dirnames: List[Path] = []
        logs = []
        for ev in selected:
            entry = {"origin": ev.origin.strftime("%Y%m%d%H%M%S"), "request_id": "",
                     "dirname": "", "error": ""}
            try:
                rid = self.wire.request_event(ev, self.span_minutes)
                entry["request_id"] = rid
                blob = self.wire.download_event(rid)
                out_dir = self.save_dir / ev.origin.strftime("%Y%m%d%H%M%S")
                _extract_zip(blob, out_dir)
                entry["dirname"] = out_dir.name
                dirnames.append(out_dir)
            except Exception as e:  # log + continue, like the FDSN workers
                entry["error"] = type(e).__name__
            logs.append(entry)
        pd.DataFrame(logs).to_csv(self.save_dir / "hinet_event_log.csv", index=False)
        return dirnames


def download_jma_unified_catalog(
    wire,
    save_dir,
    startdate: datetime,
    enddate: datetime,
    relogin_every_s: float = 600.0,
    clock: Callable[[], float] = None,
) -> List[Path]:
    """Reference ``JapanDataset.download_jma_unified_catalog``
    (`data.py:192-225`): walk the range in 7-day strides, save each response
    as ``cat_<start>_<end>``, and refresh the session every 10 minutes (the
    reference reconnects its client on that cadence)."""
    import time as _time

    clock = clock or _time.perf_counter
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    out: List[Path] = []
    startdate_limit = enddate - timedelta(days=6)
    last_connect = clock()
    cur = startdate
    while cur <= startdate_limit:
        blob = wire.get_arrivaltime(cur.date(), 7)
        name = f"cat_{cur.strftime('%Y%m%d')}_{(cur + timedelta(days=6)).strftime('%Y%m%d')}"
        path = save_dir / name
        path.write_bytes(blob)
        out.append(path)
        cur += timedelta(days=7)
        if clock() - last_connect > relogin_every_s:
            wire.login()
            last_connect = clock()
    return out


def check_jma_unified_catalog(catalog_dir) -> List[Path]:
    """Reference ``JapanDataset.check_jma_unified_catalog``
    (`data.py:227-247`): flag downloads that are single-line or HTML error
    pages. Returns the bad paths instead of printing."""
    bad: List[Path] = []
    for path in sorted(Path(catalog_dir).iterdir()):
        if not path.is_file():
            continue
        text = path.read_text(errors="replace")
        lines = text.splitlines()
        if len(lines) <= 1 or "<!DOCTYPE html>" in text:
            bad.append(path)
    return bad


def _extract_zip(blob: bytes, out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        for info in zf.infolist():
            name = Path(info.filename).name  # flatten; refuse path traversal
            if not name or info.is_dir():
                continue
            with zf.open(info) as src, open(out_dir / name, "wb") as dst:
                dst.write(src.read())
