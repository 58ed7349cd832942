"""Streaming operators (SURVEY.md §2.9): the streaming twin of the batch
aggregations, designed so batch result ≡ replayed-stream result (the test
contract in SURVEY.md §2.11 item 12).

The reference is purely batch with `.done`-marker incrementality; its
idiomatic Spark upgrade is Structured Streaming with checkpoints
(``Trigger.AvailableNow`` covers the marker-file use case exactly).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: tuple[str, ...] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregation, batch or streaming input alike.

    Output: window_start, window_end, group cols, n, total (if value_col).
    Batch form ≡ DuckDB ``time_bucket``; streaming form is the same plan with
    a watermark upstream.
    """
    aggs = [F.count("*").alias("n")]
    if value_col:
        # decimal sum: deterministic under any partial-agg order (see
        # functions.money_sum) — required for batch ≡ stream equivalence.
        aggs.append(F.sum(F.col(value_col).cast("decimal(30,4)")).cast("double").alias("total"))
    return (
        df.groupBy(F.window(F.col(ts_col), duration), *group_cols)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            *[F.col(c) for c in ("n", "total") if value_col or c == "n"],
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sliding-window counts (overlapping windows)."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide), *group_cols)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n",
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: tuple[str, ...],
) -> DataFrame:
    """Session-window aggregation (``session_window`` — dynamic windows that
    merge while events arrive within ``gap``)."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), *group_cols)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *group_cols,
            "n",
        )
    )


def stream_from_parquet_dir(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    glob_filter: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory (the streaming twin of the
    reference's incremental bronze discovery, ``clean_transform.py:27-59``).

    The file source requires a *directory*; a single file is expressed as its
    parent dir + ``pathGlobFilter``.
    """
    reader = spark.readStream.schema(schema).format("parquet")
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def run_stream_to_memory(
    agg_df: DataFrame,
    query_name: str,
    *,
    output_mode: str = "complete",
) -> None:
    """Drive a streaming aggregation to completion synchronously (memory
    sink + ``processAllAvailable``) — the local test/verification harness.
    Production sinks swap ``format``/``foreachBatch``; semantics unchanged."""
    q = (
        agg_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def replay_events(
    spark: SparkSession,
    parquet_path: str,
    build,
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    query_name: str = "events_replay",
    output_mode: str = "complete",
) -> DataFrame:
    """Replay a parquet events table through a real streaming query and
    return the (batch) result table: file source → watermark → ``build(df)``
    → memory sink. Used both by tests and as driver-visible queries.

    ``build`` receives the watermarked stream and returns the streaming
    transformation to run.
    """
    # ns-timestamp columns stream as raw longs (see sources/io.load_table);
    # rebuild the event-time column before the watermark.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(parquet_path).schema
    if os.path.isfile(parquet_path):
        stream = stream_from_parquet_dir(
            spark, os.path.dirname(parquet_path), schema, glob_filter=os.path.basename(parquet_path)
        )
    else:
        stream = stream_from_parquet_dir(spark, parquet_path, schema)
    if dict(stream.dtypes).get(ts_col) == "bigint":
        stream = stream.withColumn(ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000")))
    agg = build(stream.withWatermark(ts_col, watermark))
    run_stream_to_memory(agg, query_name, output_mode=output_mode)
    return spark.table(query_name)


def replay_events_tumbling(
    spark: SparkSession,
    parquet_path: str,
    *,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str | None = "value",
    watermark: str = "1 hour",
    query_name: str = "events_tumbling",
) -> DataFrame:
    """Tumbling-window streaming twin of ``tumbling_agg`` (batch ≡ stream)."""
    return replay_events(
        spark,
        parquet_path,
        lambda s: tumbling_agg(s, ts_col, duration, group_cols, value_col),
        ts_col=ts_col,
        watermark=watermark,
        query_name=query_name,
    )
