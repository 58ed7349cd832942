"""Funnel / cohort-retention operator tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import funnel


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


def test_funnel_requires_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "view", _ts("2024-01-01T00:00:00")),
        (1, "click", _ts("2024-01-01T01:00:00")),
        (1, "purchase", _ts("2024-01-01T02:00:00")),
        # user 2: purchase BEFORE view — must not count as converted
        (2, "purchase", _ts("2024-01-01T00:00:00")),
        (2, "view", _ts("2024-01-01T01:00:00")),
        # user 3: view only
        (3, "view", _ts("2024-01-01T00:00:00")),
    ]
    out = {r.step: r.n_users for r in funnel.funnel_counts(
        _events(spark, rows), ("view", "click", "purchase")).collect()}
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_step_strictly_after(spark):
    # click at the EXACT same instant as the first view does not count
    rows = [
        (1, "view", _ts("2024-01-01T00:00:00")),
        (1, "click", _ts("2024-01-01T00:00:00")),
    ]
    out = {r.step: r.n_users for r in funnel.funnel_counts(
        _events(spark, rows), ("view", "click")).collect()}
    assert out == {"view": 1, "click": 0}


def test_funnel_single_exchange(spark):
    rows = [(1, "view", _ts("2024-01-01T00:00:00"))]
    df = funnel.funnel_step_times(_events(spark, rows), ("view", "click", "purchase"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # all three step windows share the user_id partitioning: one exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_cohort_retention_offsets(spark):
    rows = [
        (1, "view", _ts("2024-01-01T10:00:00")),
        (1, "view", _ts("2024-01-01T23:00:00")),  # same day: not double-counted
        (1, "click", _ts("2024-01-03T00:00:00")),
        (2, "view", _ts("2024-01-02T00:00:00")),
    ]
    out = {(str(r.cohort_day), r.day_offset): r.n_users for r in funnel.cohort_retention(
        _events(spark, rows)).collect()}
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_cohort_retention_max_offset(spark):
    rows = [
        (1, "view", _ts("2024-01-01T00:00:00")),
        (1, "view", _ts("2024-01-20T00:00:00")),
    ]
    out = funnel.cohort_retention(_events(spark, rows), max_offset=7)
    assert {r.day_offset for r in out.collect()} == {0}
