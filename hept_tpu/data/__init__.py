from .synthetic import synthetic_tracking_event, synthetic_pileup_event
from .batching import Event, pack_events

__all__ = [
    "synthetic_tracking_event",
    "synthetic_pileup_event",
    "Event",
    "pack_events",
]
