from .events import (
    read_events_stream,
    session_window_agg,
    sessionize_batch,
    sliding_counts,
    tumbling_counts,
)
from .sinks import (
    idempotent_parquet_batch_writer,
    start_foreach_batch_sink,
    start_parquet_sink,
)

__all__ = [
    "read_events_stream",
    "session_window_agg",
    "sessionize_batch",
    "sliding_counts",
    "tumbling_counts",
    "idempotent_parquet_batch_writer",
    "start_foreach_batch_sink",
    "start_parquet_sink",
]
