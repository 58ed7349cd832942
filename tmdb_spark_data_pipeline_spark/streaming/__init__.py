from .windows import (
    replay_events,
    replay_events_tumbling,
    session_agg,
    sliding_agg,
    stream_from_parquet_dir,
    tumbling_agg,
)

__all__ = [
    "replay_events",
    "replay_events_tumbling",
    "session_agg",
    "sliding_agg",
    "stream_from_parquet_dir",
    "tumbling_agg",
]
