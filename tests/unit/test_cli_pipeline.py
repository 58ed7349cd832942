"""End-to-end smoke test for the runnable pipeline CLI (``__main__``):
one command produces Bronze → Silver → Gold → viz-data with markers
(≙ the reference's four compose-sequenced spark-submit stages)."""

from __future__ import annotations

import os

from tmdb_spark_data_pipeline_spark.__main__ import main


def test_pipeline_end_to_end(spark, tmp_path):
    data = str(tmp_path / "movie_data")
    assert main(["--data-dir", data, "--stage", "all", "--date", "2026-08-13"]) == 0

    # every layer landed
    silver = spark.read.parquet(f"{data}/silver")
    assert silver.count() > 0
    # Released-only + quarantine drop: fixture has 9 keys, 1 invalid, 1 unreleased
    assert silver.filter("title = 'Fixture Movie 3'").count() == 0
    assert spark.read.parquet(f"{data}/gold/highest_revenue").count() > 0
    assert spark.read.parquet(f"{data}/gold/top_directors").count() > 0
    assert spark.read.parquet(f"{data}/viz/genre_roi").count() > 0

    # marker protocol: every stage recorded its unit
    for layer in ("bronze", "silver", "gold", "viz"):
        assert os.path.exists(f"{data}/{layer}/.done/2026-08-13")

    # idempotent: a second run is a no-op (markers gate re-processing)
    mtime = os.path.getmtime(f"{data}/silver/.done/2026-08-13")
    assert main(["--data-dir", data, "--stage", "all", "--date", "2026-08-13"]) == 0
    assert os.path.getmtime(f"{data}/silver/.done/2026-08-13") == mtime


def test_pipeline_quarantine_captures_invalid(spark, tmp_path):
    data = str(tmp_path / "movie_data")
    assert main(["--data-dir", data, "--stage", "ingest", "--date", "2026-08-13"]) == 0
    bad = spark.read.json(f"{data}/quarantine")
    assert bad.count() >= 1
    assert bad.filter("success = false").count() == bad.count()


def test_ingest_aborts_over_rejection_threshold(spark, tmp_path):
    import pytest

    from tmdb_spark_data_pipeline_spark.__main__ import stage_ingest
    from tmdb_spark_data_pipeline_spark.pipelines.config import MoviePipelineConfig
    from tmdb_spark_data_pipeline_spark.sources import io as sio

    strict = MoviePipelineConfig(max_rejection_rate=0.0)  # fixture has 2 rejects
    with pytest.raises(RuntimeError, match="rejection rate"):
        stage_ingest(spark, str(tmp_path), "2026-01-01", strict)
    # abort must leave no done-marker and no bronze output
    assert sio.find_unprocessed(f"{tmp_path}/bronze", ["2026-01-01"]) == ["2026-01-01"]


def test_to_pandas_bridge_post_aggregation(spark):
    """S13 (reference visualization/visualize.py:56-57): the sanctioned
    pandas bridge — project + toPandas via Arrow, presentation edge only."""
    from tmdb_spark_data_pipeline_spark.sources.io import to_pandas

    df = spark.createDataFrame(
        [("a", 3), ("b", 5)], ["genre", "n"]
    )
    pdf = to_pandas(df, cols=("genre", "n"))
    assert list(pdf.columns) == ["genre", "n"]
    assert sorted(map(tuple, pdf.itertuples(index=False))) == [("a", 3), ("b", 5)]
    # projection argument prunes columns before the collect
    pdf2 = to_pandas(df.withColumn("extra", df.n * 2), cols=("genre",))
    assert list(pdf2.columns) == ["genre"]


def test_stamp_audit_columns(spark):
    """S14 (reference fetch_movies.py:303-305): run_id + ingestion timestamp
    stamping, optional partition date."""
    from tmdb_spark_data_pipeline_spark.sources.io import stamp_audit_columns

    df = spark.createDataFrame([(1,)], ["id"])
    out = stamp_audit_columns(df, run_id="run-2024-01-01", ingestion_date="2024-01-01")
    row = out.first()
    assert row.run_id == "run-2024-01-01"
    assert row.ingestion_date == "2024-01-01"
    assert row.ingestion_timestamp is not None
    # without a date the partition column is absent (append-only audit stamp)
    no_date = stamp_audit_columns(df, run_id="r2")
    assert "ingestion_date" not in no_date.columns
    assert {"id", "ingestion_timestamp", "run_id"} <= set(no_date.columns)
