"""Tests: single-pass table profiling + skew-salted join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import joins, profile


def test_profile_table_basic(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], ["k", "v"]
    )
    rows = {r.column: r for r in profile.profile_table(df).collect()}
    assert rows["k"].n_rows == 3 and rows["k"].n_nulls == 0
    assert rows["k"].n_distinct == 2
    assert (rows["k"].min_value, rows["k"].max_value) == ("1", "2")
    assert rows["v"].n_nulls == 1
    assert rows["v"].n_distinct == 2  # nulls excluded from distinct


def test_profile_table_approx_variant_schema(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    row = profile.profile_table(df, approx=True).first()
    assert row.n_rows == 100
    assert 90 <= row.n_distinct <= 110  # HLL estimate


def test_salted_join_equals_plain_join(spark):
    # skewed left: key 1 has 100 rows, others 1 each
    left = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(k, 0) for k in range(2, 10)], ["k", "payload"]
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(0, 8)], ["k", "tag"])
    plain = left.join(right, "k", "inner")
    salted = joins.salted_join(left, right, "k", salt=4)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    lplain = left.join(right, "k", "left")
    lsalted = joins.salted_join(left, right, "k", salt=4, how="left")
    assert sorted(map(tuple, lsalted.collect())) == sorted(map(tuple, lplain.collect()))


def test_salted_join_spreads_hot_key(spark):
    left = spark.createDataFrame([(1, i) for i in range(64)], ["k", "payload"])
    right = spark.createDataFrame([(1, "x")], ["k", "tag"])
    salted = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(4)),
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets > 1  # the hot key's rows really do land in many buckets
    out = joins.salted_join(left, right, "k", salt=4)
    assert out.count() == 64


def test_salted_join_rejects_unsupported(spark):
    df = spark.createDataFrame([(1, 2)], ["k", "v"])
    with pytest.raises(ValueError):
        joins.salted_join(df, df, "k", how="full")
    with pytest.raises(ValueError):
        joins.salted_join(df, df, "k", salt=1)
