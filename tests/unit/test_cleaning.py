"""Operator-level tests for cleaning/normalization (SURVEY.md §2.2, §2.8).

Mirrors the reference's test granularity (``tests/test_transform.py``) but
imports the real operator functions instead of re-implementing expressions
inline (the test-to-prod drift called out in SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import cleaning


def test_filter_equals_keeps_matching_rows(spark):
    df = spark.createDataFrame(
        [(1, "Released"), (2, "Rumored"), (3, "Released")], ["id", "status"]
    )
    out = cleaning.filter_equals(df, "status", "Released")
    assert out.count() == 2


def test_filter_equals_is_guarded_for_missing_column(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    assert cleaning.filter_equals(df, "status", "Released").count() == 1


def test_cast_columns_applies_map_and_passes_through(spark):
    df = spark.createDataFrame([("1", "2.5", "x")], ["a", "b", "c"])
    out = cleaning.cast_columns(df, {"a": "int", "b": "double"})
    types = dict(out.dtypes)
    assert types == {"a": "int", "b": "double", "c": "string"}
    row = out.first()
    assert row.a == 1 and row.b == 2.5 and row.c == "x"


def test_null_non_positive(spark):
    df = spark.createDataFrame([(1, 100), (2, 0), (3, -5)], ["id", "budget"])
    out = cleaning.null_non_positive(df, ("budget",)).orderBy("id").collect()
    assert [r.budget for r in out] == [100, None, None]


def test_null_when_unsupported(spark):
    df = spark.createDataFrame([(7.5, 10), (9.0, 0)], ["vote_average", "vote_count"])
    out = cleaning.null_when_unsupported(df, "vote_average", "vote_count").collect()
    assert sorted([r.vote_average for r in out], key=lambda v: (v is None, v)) == [7.5, None]


def test_replace_sentinels(spark):
    df = spark.createDataFrame([("No Data",), ("real",)], ["overview"])
    vals = {r.overview for r in cleaning.replace_sentinels(df, ("overview",)).collect()}
    assert vals == {None, "real"}


def test_completeness_filter_counts_non_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", "b"), (2, None, "b"), (3, None, None)], ["id", "x", "y"]
    )
    assert cleaning.completeness_filter(df, 3).count() == 1
    assert cleaning.completeness_filter(df, 2).count() == 2
    # restricted column set
    assert cleaning.completeness_filter(df, 1, cols=("x", "y")).count() == 2


def test_dedup_by_key_keeps_deterministic_winner(spark):
    df = spark.createDataFrame(
        [(1, "2020-01-02", "late"), (1, "2020-01-01", "early"), (2, "2020-05-05", "only")],
        ["id", "d", "tag"],
    )
    out = cleaning.dedup_by_key(df, ("id",), tiebreak=(F.col("d"),)).orderBy("id").collect()
    assert [r.tag for r in out] == ["early", "only"]


def test_dedup_by_key_without_tiebreak_unique_keys(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["id", "v"])
    assert cleaning.dedup_by_key(df, ("id",)).count() == 2


def test_expect_counts_each_violation_kind(spark):
    from pyspark.sql import functions as F

    from tmdb_spark_data_pipeline_spark.operators import quality as dq

    df = spark.createDataFrame(
        [
            (1, "A", 5.0, 10),
            (1, "B", -2.0, 20),   # duplicate key + out-of-range + bad value
            (None, "A", 3.0, 99), # null key + orphan fk
            (3, None, 50.0, 10),  # null category doesn't violate accepted_values
        ],
        "k int, cat string, v double, fk int",
    )
    ref = spark.createDataFrame([(10,), (20,)], "rk int")
    out = {
        (r.rule, r.column): (r.n_violations, r.passed)
        for r in dq.expect(
            df,
            [
                dq.not_null("k"),
                dq.unique("k"),
                dq.accepted_values("cat", ("A",)),
                dq.in_range("v", 0, 10),
                dq.relationship("fk", ref, "rk"),
            ],
        ).collect()
    }
    assert out[("not_null", "k")] == (1, False)
    assert out[("unique", "k")] == (1, False)          # one extra '1'
    assert out[("accepted_values", "cat")] == (1, False)  # 'B'; NULL exempt
    assert out[("in_range", "v")] == (2, False)        # -2 and 50
    assert out[("relationship", "fk")] == (1, False)   # fk=99 orphan


def test_expect_empty_rule_list_is_a_clear_error(spark):
    import pytest

    from tmdb_spark_data_pipeline_spark.operators import quality as dq

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="at least one Rule"):
        dq.expect(df, [])


def test_expect_single_scan_for_row_rules(spark):
    import contextlib
    import io

    from tmdb_spark_data_pipeline_spark.operators import quality as dq
    from tmdb_spark_data_pipeline_spark.sources.io import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    plan_df = dq.expect(
        o,
        [dq.not_null("o_orderkey"), dq.unique("o_orderkey"),
         dq.in_range("o_totalprice", 0, 1e9)],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    # all row-level rules share ONE scan node (formatted explain prints
    # each node twice: tree line + detail header)
    assert plan.count("Scan parquet") == 2
