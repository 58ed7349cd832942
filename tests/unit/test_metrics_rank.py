"""Derived metrics + ranking tests (SURVEY.md §2.5 T1-T4, §2.8 F10-F11) —
the reference's profit/ROI/top-k semantics (``analytics/kpis.py:54-96``) with
the determinism fixes (nulls-last, tie-breakers, try_divide)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import metrics, rank


@pytest.fixture(scope="module")
def movies(spark):
    return spark.createDataFrame(
        [
            (1, 500.0, 100.0, 7.0),
            (2, 100.0, 20.0, 8.0),
            (3, 50.0, 0.0, None),  # zero budget → ROI must be NULL, not error
            (4, None, 5.0, 8.0),  # null metric must sort last
        ],
        ["id", "revenue_musd", "budget_musd", "rating"],
    )


def test_to_millions(spark):
    df = spark.createDataFrame([(250_000_000,)], ["budget"])
    assert df.select(metrics.to_millions("budget").alias("m")).first().m == 250.0


def test_with_profit(movies):
    out = metrics.with_profit(movies, "revenue_musd", "budget_musd").orderBy("id").collect()
    assert out[0].profit == 400.0
    assert out[3].profit is None


def test_with_ratio_null_on_zero_denominator(movies):
    out = metrics.with_ratio(movies, "revenue_musd", "budget_musd").orderBy("id").collect()
    assert out[0].roi == 5.0
    assert out[2].roi is None  # 50/0 → NULL (try_divide), never DIVIDE_BY_ZERO


def test_with_ratio_min_den_floor(movies):
    out = metrics.with_ratio(movies, "revenue_musd", "budget_musd", min_den=10.0).orderBy("id").collect()
    assert out[0].roi == 5.0
    assert out[1].roi == 5.0
    assert out[2].roi is None  # below the reference's budget >= 10 floor


def test_top_k_desc_nulls_last_with_tiebreak(movies):
    out = rank.top_k(movies, "rating", order="desc", k=3, tiebreak=("id",)).collect()
    assert [r.id for r in out] == [2, 4, 1]  # 8.0(id2), 8.0(id4), 7.0 — null last


def test_top_k_asc_nulls_last(movies):
    out = rank.top_k(movies, "rating", order="asc", k=4, tiebreak=("id",)).collect()
    assert [r.id for r in out] == [1, 2, 4, 3]  # nulls last even ascending


def test_top_k_filter_expr(movies):
    out = rank.top_k(
        movies, "rating", order="desc", k=5, tiebreak=("id",), filter_expr=F.col("budget_musd") >= 10
    ).collect()
    assert [r.id for r in out] == [2, 1]


def test_top_k_invalid_order_raises(movies):
    with pytest.raises(ValueError):
        rank.top_k(movies, "rating", order="sideways")


def test_top_n_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        ["grp", "id", "m"],
    )
    out = rank.top_n_per_group(df, ("grp",), "m", order="desc", n=2, tiebreak=("id",))
    rows = [(r.grp, r.id, r.rnk) for r in out.orderBy("grp", "rnk").collect()]
    assert rows == [("a", 2, 1), ("a", 3, 2), ("b", 4, 1)]


def test_global_topk_plan_uses_take_ordered(movies):
    plan = rank.top_k(movies, "rating", order="desc", k=2, tiebreak=("id",))._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no full sort for global top-k
