from .incremental import process_available_now
from .listener import ProgressCapture
from .sinks import run_exactly_once_parquet, write_epoch_overwrite
from .stateful import stateful_last_state, stateful_user_totals, stateful_user_totals_tws
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
    "run_exactly_once_parquet",
    "replay_events",
    "replay_events_pair",
    "replay_events_tumbling",
    "run_stream_to_memory",
    "session_agg",
    "sliding_agg",
    "ProgressCapture",
    "stateful_last_state",
    "stateful_user_totals",
    "stateful_user_totals_tws",
    "write_epoch_overwrite",
    "stream_from_parquet_dir",
    "tumbling_agg",
]
