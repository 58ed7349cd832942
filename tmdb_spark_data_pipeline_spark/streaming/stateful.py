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


CDC_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
        StructField("op", StringType()),
        StructField("value", DoubleType()),
    ]
)

CDC_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_op", StringType()),
        StructField("last_value", DoubleType()),
        StructField("ts_us", LongType()),
    ]
)


def stateful_last_state(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    op_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """CDC merge as a per-key state machine: keep only the NEWEST change per
    key (total order (event time, id)), emit the current state row each
    micro-batch — the streaming materialization of ``timeseries.last_state``.

    Tombstones stay IN state rather than deleting it: a late-arriving older
    update must not resurrect a deleted key, so the delete marker itself is
    the state and the *reader* filters it (exactly how Kafka-compacted
    topics and CDC mirrors handle deletes). State is one tiny row per key —
    O(distinct keys), unbounded-stream viable.

    Each Arrow batch is reduced vectorized (sort by (ts, id), take the last
    row) before the scalar state compare — no per-row Python.
    """
    import pandas as pd

    def update(
        key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        cur = state.get if state.exists else None  # (ts_us, id, op, value)
        for pdf in pdfs:
            if not len(pdf):
                continue
            top = pdf.sort_values([ts_col, id_col]).iloc[-1]
            ts_us = int(top[ts_col].value // 1_000)  # pandas ns -> micros
            cand = (
                ts_us,
                int(top[id_col]),
                str(top[op_col]),
                float(top[value_col]) if top[value_col] == top[value_col] else None,
            )
            if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                cur = cand
        state.update(cur)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_op": [cur[2]],
                "last_value": [cur[3]],
                "ts_us": [cur[0]],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        CDC_OUT_SCHEMA,
        CDC_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
