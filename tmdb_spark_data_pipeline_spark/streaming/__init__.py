from .incremental import process_available_now
from .stateful import stateful_user_totals
from .windows import (
    replay_events,
    replay_events_tumbling,
    session_agg,
    sliding_agg,
    stream_from_parquet_dir,
    tumbling_agg,
)

__all__ = [
    "process_available_now",
    "replay_events",
    "replay_events_tumbling",
    "session_agg",
    "sliding_agg",
    "stateful_user_totals",
    "stream_from_parquet_dir",
    "tumbling_agg",
]
