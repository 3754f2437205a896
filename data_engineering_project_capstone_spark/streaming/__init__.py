from .events import (
    read_events_stream,
    session_window_agg,
    sessionize_batch,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "session_window_agg",
    "sessionize_batch",
    "sliding_counts",
    "tumbling_counts",
]
