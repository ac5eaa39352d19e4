from volpick_tpu.acquisition.events import Catalog, Event, Origin, Magnitude, PhasePick
from volpick_tpu.acquisition.catalogs import (
    read_hypoinverse_catalog,
    read_ncedc_summary,
    read_hvo_summary,
    read_hypoinverse_summary,
    group_picks,
)
from volpick_tpu.acquisition.comcat import (
    download_phases,
    group_comcat_picks,
    read_PNSN_events,
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
    "download_phases",
    "group_comcat_picks",
    "read_PNSN_events",
]
