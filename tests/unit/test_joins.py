"""Join-surface tests (SURVEY.md §2.3): type validation, broadcast star join,
as-of join semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import joins


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_join_type_validation(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        joins.join(df, df, ["k"], "sideways")


def test_semi_and_anti(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2,), (3,)], ["k"])
    assert sorted(r.k for r in joins.join(left, right, ["k"], "left_semi").collect()) == [2, 3]
    assert [r.k for r in joins.join(left, right, ["k"], "left_anti").collect()] == [1]


def test_star_join_broadcasts_dims(spark):
    fact = spark.createDataFrame([(1, 10), (2, 20)], ["k", "dim_id"])
    dim = spark.createDataFrame([(10, "a"), (20, "b")], ["dim_id", "name"])
    out = joins.star_join(fact, [(dim, ["dim_id"])])
    assert sorted((r.k, r.name) for r in out.collect()) == [(1, "a"), (2, "b")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_asof_backward_picks_latest_at_or_before(spark):
    purchases = spark.createDataFrame(
        [(100, "u1", _ts("2024-01-01T10:00:00"))], ["event_id", "user_id", "ts"]
    )
    clicks = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T09:00:00")),
            (2, "u1", _ts("2024-01-01T09:59:00")),  # latest at-or-before → winner
            (3, "u1", _ts("2024-01-01T10:01:00")),  # after — excluded
            (4, "u2", _ts("2024-01-01T09:30:00")),  # other key — excluded
        ],
        ["event_id", "user_id", "ts"],
    )
    out = joins.asof_join(purchases, clicks, on="user_id", left_time="ts", right_time="ts")
    rows = out.select(F.col("l.event_id").alias("p"), F.col("r.event_id").alias("c")).collect()
    assert [(r.p, r.c) for r in rows] == [(100, 2)]


def test_asof_forward_direction(spark):
    left = spark.createDataFrame([(1, "k", _ts("2024-01-01T00:00:00"))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [
            (10, "k", _ts("2023-12-31T23:00:00")),  # before — excluded
            (11, "k", _ts("2024-01-01T00:30:00")),  # earliest at-or-after → winner
            (12, "k", _ts("2024-01-01T01:00:00")),
        ],
        ["id", "k", "ts"],
    )
    out = joins.asof_join(left, right, on="k", left_time="ts", right_time="ts", direction="forward")
    assert out.select(F.col("r.id").alias("rid")).first().rid == 11


def test_asof_tiebreak_on_equal_right_timestamps(spark):
    purchases = spark.createDataFrame(
        [(100, "u1", _ts("2024-01-01T10:00:00"))], ["event_id", "user_id", "ts"]
    )
    # two clicks at the identical timestamp: tiebreak=event_id (desc for
    # backward) must deterministically pick the higher id
    clicks = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T09:59:00")),
            (7, "u1", _ts("2024-01-01T09:59:00")),
        ],
        ["event_id", "user_id", "ts"],
    )
    out = joins.asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        left_id="event_id",
        tiebreak="event_id",
    )
    assert out.select(F.col("r.event_id").alias("c")).first().c == 7


def test_asof_left_id_keeps_duplicate_left_rows(spark):
    # two left rows identical in every column: with left_id they must BOTH
    # survive (the all-columns fallback would collapse them into one)
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T00:00:00")), (2, "k", _ts("2024-01-01T00:00:00"))],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame([(10, "k", _ts("2023-12-31T23:00:00"))], ["id", "k", "ts"])
    out = joins.asof_join(
        left, right, on="k", left_time="ts", right_time="ts", left_id="id", tiebreak="id"
    )
    rows = out.select(F.col("l.id").alias("lid"), F.col("r.id").alias("rid")).collect()
    assert sorted((r.lid, r.rid) for r in rows) == [(1, 10), (2, 10)]


def test_asof_unmatched_left_rows_survive_with_nulls(spark):
    left = spark.createDataFrame([(1, "k", _ts("2024-01-01T00:00:00"))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(10, "k", _ts("2024-06-01T00:00:00"))], ["id", "k", "ts"]
    )
    out = joins.asof_join(left, right, on="k", left_time="ts", right_time="ts")
    row = out.select(F.col("l.id").alias("lid"), F.col("r.id").alias("rid")).first()
    assert (row.lid, row.rid) == (1, None)


def test_interval_overlap_pairs_blocking_and_verify(spark):
    iv = spark.createDataFrame(
        [
            # A and B overlap mid-interval; C touches B exactly at its end
            # instant (closed intervals -> overlap); D is disjoint; E spans
            # MANY hour buckets and overlaps only D-adjacent F
            (1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:30:00")),  # A
            (2, _ts("2024-01-01T10:15:00"), _ts("2024-01-01T11:00:00")),  # B
            (3, _ts("2024-01-01T11:00:00"), _ts("2024-01-01T11:20:00")),  # C
            (4, _ts("2024-01-02T09:00:00"), _ts("2024-01-02T09:10:00")),  # D
            (5, _ts("2024-01-01T20:00:00"), _ts("2024-01-02T09:05:00")),  # E (13h span)
        ],
        ["id", "s", "e"],
    )
    out = joins.interval_overlap_pairs(iv, "id", "s", "e", bucket_seconds=3600)
    got = sorted((r.id_a, r.id_b) for r in out.collect())
    # (1,2) mid overlap; (2,3) boundary instant; (4,5) long-span E reaches D;
    # dedup: E and D share bucket 09:00 only once despite E covering 14 buckets
    assert got == [(1, 2), (2, 3), (4, 5)]
    assert out.count() == len(set(got))  # distinct survived the multi-bucket fanout


def test_asof_cogrouped_matches_composed_form(spark, sf_smoke):
    from pyspark.sql import functions as F

    from tmdb_spark_data_pipeline_spark.operators import joins
    from tmdb_spark_data_pipeline_spark.sources.io import load_table

    ev = load_table(spark, sf_smoke, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    composed = {
        (r["p_id"], r["c_id"])
        for r in joins.asof_join(
            purchases, clicks, on="user_id", left_time="ts", right_time="ts",
            direction="backward", left_id="event_id", tiebreak="event_id",
        )
        .select(F.col("l.event_id").alias("p_id"), F.col("r.event_id").alias("c_id"))
        .collect()
    }
    cogrouped = {
        (r["event_id"], r["r_event_id"])
        for r in joins.asof_join_cogrouped(
            purchases, clicks, on="user_id", left_time="ts", right_time="ts",
            right_cols=("event_id", "value"), tiebreak="event_id",
        ).collect()
    }
    assert cogrouped == composed


def test_asof_cogrouped_tolerance_and_empty_right(spark):
    import datetime as dt

    from tmdb_spark_data_pipeline_spark.operators import joins

    def ts(d, h=0):
        return dt.datetime(2024, 1, d, h)

    left = spark.createDataFrame(
        [(1, 1, ts(10)), (2, 1, ts(20)), (3, 2, ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(9), 100, 1.0), (1, ts(2), 101, 2.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = {
        r["event_id"]: r["r_event_id"]
        for r in joins.asof_join_cogrouped(
            left, right, on="user_id", left_time="ts", right_time="ts",
            right_cols=("event_id", "value"), tiebreak="event_id",
            tolerance="7D",
        ).collect()
    }
    # event 1: click 1 day before -> within 7D tolerance
    # event 2: nearest click 11 days before -> OUTSIDE tolerance -> null
    # event 3: user 2 has NO right rows at all -> null (empty-right path)
    assert out == {1: 100, 2: None, 3: None}


def test_asof_cogrouped_alias_collisions(spark):
    # Three alias edge cases that used to duplicate r_* columns:
    #   tiebreak == right_time; `on` listed in right_cols; right_time in
    #   right_cols. All three at once must still run and match backward-asof.
    import datetime as dt

    from tmdb_spark_data_pipeline_spark.operators import joins

    def ts(d, h=0):
        return dt.datetime(2024, 1, d, h)

    left = spark.createDataFrame(
        [(1, 1, ts(10)), (2, 1, ts(3)), (3, 2, ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(9), 100), (1, ts(5), 101), (2, ts(1), 102)],
        "user_id long, ts timestamp, click_id long",
    )
    out = {
        r["event_id"]: (r["r_user_id"], r["r_ts"], r["r_click_id"])
        for r in joins.asof_join_cogrouped(
            left, right, on="user_id", left_time="ts", right_time="ts",
            right_cols=("user_id", "ts", "click_id"), tiebreak="ts",
        ).collect()
    }
    assert out == {
        1: (1, ts(9), 100),
        2: (None, None, None),  # user 1 has no right row at/before day 3
        3: (2, ts(1), 102),
    }
