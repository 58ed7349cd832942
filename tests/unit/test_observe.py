"""Single-pass observe() metrics tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import observe


def test_observed_write_metrics_single_pass(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], ["id", "v"]
    )
    got = observe.observed_write(
        df, str(tmp_path / "out"), null_cols=("v", "id")
    )
    assert got["n_rows"] == 4
    assert got["null_rate_v"] == 0.5
    assert got["null_rate_id"] == 0.0
    assert spark.read.parquet(str(tmp_path / "out")).count() == 4


def test_observed_write_enforces_threshold(spark, tmp_path):
    df = spark.createDataFrame([(1, None), (2, "b")], ["id", "v"])
    with pytest.raises(ValueError, match="null-rate threshold"):
        observe.observed_write(
            df, str(tmp_path / "out2"), null_cols=("v",), max_null_rate=0.2
        )
