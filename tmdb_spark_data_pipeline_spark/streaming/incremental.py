"""Incremental batch-over-stream processing (SURVEY.md §2.1 S11/S12).

The reference discovers unprocessed inputs by diffing a directory listing
against ``.done`` marker files (``transform/clean_transform.py:27-64``,
``analytics/kpis.py:26-51``). The idiomatic Spark twin is a Structured
Streaming file source with ``Trigger.AvailableNow`` and a checkpoint: the
checkpoint's file log IS the marker set — exactly-once per input file,
object-store safe, and the same code path scales from a nightly batch to a
continuous stream by changing only the trigger.

(The plain marker protocol is kept too — ``sources/io.find_unprocessed`` /
``mark_done`` — for callers that want no streaming machinery.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def process_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    transform: Callable[[DataFrame], DataFrame],
    output_dir: str,
    checkpoint_dir: str,
    *,
    query_name: str = "incremental",
    output_mode: str = "append",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Process exactly the input files not seen by ``checkpoint_dir`` yet,
    then stop (``Trigger.AvailableNow``).

    Re-running with the same checkpoint is a no-op until new files arrive —
    the replacement for the reference's ``find_unprocessed_* + mark_done``
    loop. ``transform`` must be a row-wise/stateless DataFrame function for
    append mode (filters, projections, derived columns).
    """
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(input_dir)
    out = transform(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()
    return q
