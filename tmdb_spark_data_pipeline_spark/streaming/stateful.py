"""Custom stateful streaming operators (SURVEY.md §2.9 new-engine surface).

``applyInPandasWithState``: Arrow-batched per-key state machines — the escape
hatch when built-in windows/dedup can't express the semantics. State here is
a single tiny row per key (count + sum), so state size is O(distinct keys),
not O(events) — the property that keeps it viable on an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def stateful_user_totals(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Running per-user event count + value sum, emitted each micro-batch.

    The streaming analogue of ``groupBy(user).agg(count, sum)`` but with the
    accumulator owned by user code — the template for any custom per-key
    state machine (fraud counters, CDC merge, rate limiting).
    """
    import pandas as pd

    def update(
        key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        RUNNING_TOTALS_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stateful_user_totals_tws(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """``stateful_user_totals`` on Spark 4's ``transformWithStateInPandas``
    — the successor API: typed state handles (value/list/map state, TTL,
    timers) owned per key instead of one opaque tuple, and a processor
    lifecycle (init/close) for resource setup. Same semantics as the
    ``applyInPandasWithState`` form; both are kept because the old API is
    what most deployed 3.x jobs run today and the new one is where timers /
    TTL / multiple state variables live.

    Requires the RocksDB state store provider (set by the caller/harness;
    the HDFS-backed default store does not support this operator) and the
    ``protobuf`` package (the Python↔JVM state-server protocol; absent in
    this container, so the unit test skips — the
    ``applyInPandasWithState`` form above is the one exercised end-to-end
    here).
    """
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator["pd.DataFrame"]:
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        RUNNING_TOTALS_SCHEMA,
        "Update",
        "ProcessingTime",
    )
