"""Gap-fill / forward-fill time-series tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import timeseries


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark):
    rows = [
        ("a", _ts("2024-01-01T00:10:00"), 1.0),
        ("a", _ts("2024-01-01T03:20:00"), 5.0),  # hours 1-2 are gaps for 'a'
        ("b", _ts("2024-01-01T01:00:00"), 2.0),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def test_time_grid_dense_per_key(spark):
    grid = timeseries.time_grid(_events(spark), ("k",), "ts")
    # global range 00:00..03:00 -> 4 buckets x 2 keys
    assert grid.count() == 8


def test_gap_fill_zero_and_ffill(spark):
    out = timeseries.hourly_gap_filled(_events(spark), ("k",), "ts", "v")
    rows = {
        (r.k, r.bucket.hour): (r.n_events, r.hour_total) for r in out.collect()
    }
    assert rows[("a", 0)] == (1, 1.0)
    assert rows[("a", 1)] == (0, 1.0)  # zero count, total carried forward
    assert rows[("a", 2)] == (0, 1.0)
    assert rows[("a", 3)] == (1, 5.0)
    assert rows[("b", 0)] == (0, None)  # before b's first event: no fill source
    assert rows[("b", 1)] == (1, 2.0)
    assert rows[("b", 3)] == (0, 2.0)


def test_grid_join_is_broadcast(spark):
    ev = _events(spark)
    plan = (
        timeseries.hourly_gap_filled(ev, ("k",), "ts", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_change_intervals_merges_runs(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), "a", 10),
        (1, _ts("2024-01-01T01:00:00"), "a", 11),
        (1, _ts("2024-01-01T02:00:00"), "b", 12),
        (1, _ts("2024-01-01T03:00:00"), "a", 13),
        (2, _ts("2024-01-01T00:30:00"), "x", 14),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "state", "id"])
    out = timeseries.change_intervals(df, ("k",), "ts", "state", tiebreak="id").collect()
    by_key = sorted(
        ((r.k, r.state, r.valid_from.hour, None if r.valid_to is None else r.valid_to.hour, r.n_events) for r in out),
        key=lambda t: (t[0], t[2]),
    )
    assert by_key == [
        (1, "a", 0, 2, 2),   # two 'a' events merge into one interval
        (1, "b", 2, 3, 1),
        (1, "a", 3, None, 1),  # re-entering 'a' opens a NEW interval (SCD2)
        (2, "x", 0, None, 1),
    ]


def test_change_intervals_same_ts_tiebreak(spark):
    # two events at the identical timestamp: the id tiebreak fixes run order
    rows = [
        (1, _ts("2024-01-01T00:00:00"), "a", 1),
        (1, _ts("2024-01-01T00:00:00"), "b", 2),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "state", "id"])
    out = {r.state: (r.valid_to is None) for r in timeseries.change_intervals(df, ("k",), "ts", "state", tiebreak="id").collect()}
    assert out == {"a": False, "b": True}  # a closed by b; b current


def test_rolling_zscore_flags_known_outlier(spark):
    """Stable baseline then a spike: z = (spike - mean) / std over the
    PRECEDING window only (self-exclusive — the spike can't mask itself);
    cold-start rows (fewer than min_obs preceding) get NULL z."""
    import pyspark.sql.functions as F

    from tmdb_spark_data_pipeline_spark.operators.timeseries import rolling_zscore

    rows = [(1, i, float(10 + (i % 2))) for i in range(12)]  # 10,11 alternating
    rows.append((1, 12, 100.0))  # spike
    df = spark.createDataFrame(rows, ["user_id", "seq", "value"])
    out = {r.seq: r.z for r in rolling_zscore(
        df, "user_id", ("seq",), "value", window=20, min_obs=10
    ).collect()}
    assert out[0] is None and out[9] is None  # cold start: 0..9 lack 10 priors
    assert out[10] is not None and abs(out[10]) < 2  # in-distribution
    assert out[12] > 3  # the spike flags
    # exact value: mean of 12 alternating obs = 10.5, std = sqrt(3/11)
    import math

    exp = (100.0 - 10.5) / math.sqrt((12 * 0.25) / 11)
    assert abs(out[12] - exp) < 1e-6
