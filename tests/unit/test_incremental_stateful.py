"""Incremental (AvailableNow + checkpoint) and custom-stateful
(applyInPandasWithState) streaming tests (SURVEY.md §2.1 S11/S12, §2.9)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark import streaming
from tmdb_spark_data_pipeline_spark.sources.io import find_unprocessed, load_table, mark_done


def test_marker_protocol(tmp_path):
    base = str(tmp_path)
    units = ["2024-01-01", "2024-01-02"]
    assert find_unprocessed(base, units) == units
    mark_done(base, "2024-01-01")
    assert find_unprocessed(base, units) == ["2024-01-02"]
    mark_done(base, "2024-01-01")  # idempotent
    assert find_unprocessed(base, units) == ["2024-01-02"]


def test_available_now_processes_each_file_exactly_once(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    first.coalesce(1).write.mode("append").parquet(src)

    def transform(df):
        return df.filter(F.col("id") > 0).withColumn("tagged", F.lit(True))

    streaming.process_available_now(
        spark, src, first.schema, transform, out, ckpt, query_name="inc1"
    )
    assert spark.read.parquet(out).count() == 2

    # second run with NO new files: checkpoint makes it a no-op
    streaming.process_available_now(
        spark, src, first.schema, transform, out, ckpt, query_name="inc2"
    )
    assert spark.read.parquet(out).count() == 2

    # new file arrives → only its rows are appended
    spark.createDataFrame([(3, "c")], ["id", "v"]).coalesce(1).write.mode("append").parquet(src)
    streaming.process_available_now(
        spark, src, first.schema, transform, out, ckpt, query_name="inc3"
    )
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]
    assert all(r.tagged for r in got.collect())


def test_stateful_user_totals_matches_batch_agg(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    batch = {
        r.user_id: (r.n, round(r.total, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }

    out = streaming.replay_events(
        spark,
        f"{sf_smoke}/events.parquet",
        lambda s: streaming.stateful_user_totals(s.select("user_id", "value")),
        query_name="t_stateful_totals",
        output_mode="update",
    )
    # single AvailableNow-style replay = one micro-batch → one row per user
    got = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in out.collect()}
    assert got == batch


def test_transform_with_state_totals_matches_batch_agg__env_gated_protobuf(
    spark, sf_smoke
):
    """The transformWithStateInPandas twin must produce identical running
    totals (RocksDB state store required by the API).

    PERMANENT ENV SKIP in this container: the transformWithState state-server
    wire protocol needs ``google.protobuf``, which is not installed and
    cannot be (no pip; a hand-vendored stub would fake the wire format rather
    than test it). The ``applyInPandasWithState`` twin above exercises the
    same capability end-to-end, so the skip loses redundancy, not coverage.
    On any protobuf-equipped deployment this test runs and must pass."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "PERMANENT ENV SKIP: google.protobuf absent in container "
            "(transformWithState state server; applyInPandasWithState twin covers)"
        )
    ev = load_table(spark, sf_smoke, "events")
    batch = {
        r.user_id: (r.n, round(r.total, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = streaming.replay_events(
            spark,
            f"{sf_smoke}/events.parquet",
            lambda s: streaming.stateful_user_totals_tws(s.select("user_id", "value")),
            query_name="t_tws_totals",
            output_mode="update",
        )
        got = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in out.collect()}
    finally:
        if saved is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, saved)
    assert got == batch
