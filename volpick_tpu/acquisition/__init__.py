from volpick_tpu.acquisition.events import Catalog, Event, Origin, Magnitude, PhasePick
from volpick_tpu.acquisition.catalogs import (
    read_hypoinverse_catalog,
    read_ncedc_summary,
    read_hvo_summary,
    read_hypoinverse_summary,
    group_picks,
)

__all__ = [
    "Catalog",
    "Event",
    "Origin",
    "Magnitude",
    "PhasePick",
    "read_hypoinverse_catalog",
    "read_ncedc_summary",
    "read_hvo_summary",
    "read_hypoinverse_summary",
    "group_picks",
]
