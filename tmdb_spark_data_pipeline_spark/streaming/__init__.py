from .incremental import process_available_now
from .stateful import stateful_user_totals
from .windows import (
    dedup_stream,
    replay_events,
    replay_events_pair,
    replay_events_tumbling,
    run_stream_to_memory,
    session_agg,
    sliding_agg,
    stream_from_parquet_dir,
    tumbling_agg,
)

__all__ = [
    "dedup_stream",
    "process_available_now",
    "replay_events",
    "replay_events_pair",
    "replay_events_tumbling",
    "run_stream_to_memory",
    "session_agg",
    "sliding_agg",
    "stateful_user_totals",
    "stream_from_parquet_dir",
    "tumbling_agg",
]
