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
