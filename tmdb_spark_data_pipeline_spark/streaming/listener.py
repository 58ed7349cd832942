"""Streaming observability: a ``StreamingQueryListener`` that captures
per-micro-batch progress into plain rows — the ops surface a production
streaming engine needs (lag dashboards, state-size alerts, throughput SLOs)
and the reference has no analogue of.

Capture is in-memory on the driver (progress events are driver-side and tiny
— one dict per micro-batch); a production deployment points ``sink`` at a
durable writer instead. Metrics kept: the ones an on-call actually pages on —
input rows, processing rate, trigger latency, and total state rows (the
unbounded-state early-warning).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_DDL = (
    "query_name string, batch_id bigint, num_input_rows bigint, "
    "process_rate double, trigger_ms bigint, state_rows bigint"
)


@dataclass
class ProgressCapture(StreamingQueryListener):
    """Collects one row per micro-batch across every query in the session.

    Usage::

        cap = ProgressCapture()
        cap.attach(spark)
        try:
            ... run streaming queries ...
        finally:
            cap.detach(spark)
        cap.to_df(spark).show()
    """

    rows: list[tuple] = field(default_factory=list)

    # -- listener callbacks (driver thread; keep them allocation-light) ------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(
            (op.numRowsTotal or 0) for op in (p.stateOperators or [])
        )
        durations = p.durationMs or {}
        self.rows.append(
            (
                p.name or p.id,
                int(p.batchId),
                int(p.numInputRows or 0),
                float(p.processedRowsPerSecond or 0.0),
                int(durations.get("triggerExecution", 0)),
                int(state_rows),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- lifecycle -----------------------------------------------------------
    def attach(self, spark: SparkSession) -> "ProgressCapture":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Captured progress as a DataFrame (empty-safe, fixed schema)."""
        return spark.createDataFrame(self.rows, PROGRESS_DDL)
