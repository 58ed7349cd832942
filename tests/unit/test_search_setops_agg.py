"""Search predicates, set ops, grouped aggregation (SURVEY.md §2.4, §2.6,
§2.2 P5-P7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import agg, search, setops


@pytest.fixture(scope="module")
def movies(spark):
    return spark.createDataFrame(
        [
            (1, ["Action", "Science Fiction"], ["Bruce Willis"], 100),
            (2, ["Action"], ["Uma Thurman"], 50),
            (3, ["Drama"], ["Bruce Willis"], 5),
        ],
        ["id", "genres", "cast", "vote_count"],
    )


def test_conjunctive_array_search(movies):
    # reference P5 (kpis.py:102-110) with array_contains instead of the
    # substring false-positive (SURVEY §2.8 F12)
    pred = search.all_of(
        search.array_has("genres", "Action"),
        search.array_has("cast", "Bruce Willis"),
        search.threshold("vote_count", ">=", 10),
    )
    out = search.search(movies, pred).collect()
    assert [r.id for r in out] == [1]


def test_threshold_operators(movies):
    assert search.search(movies, search.threshold("vote_count", "<", 10)).count() == 1
    assert search.search(movies, search.threshold("vote_count", ">", 50)).count() == 1
    assert search.search(movies, search.threshold("vote_count", "<=", 50)).count() == 2


def test_union_by_name_distinct(spark):
    a = spark.createDataFrame([(1,), (2,)], ["k"])
    b = spark.createDataFrame([(2,), (3,)], ["k"])
    assert setops.union_by_name([a, b]).count() == 4
    assert sorted(r.k for r in setops.union_by_name([a, b], distinct=True).collect()) == [1, 2, 3]


def test_intersect_and_except(spark):
    a = spark.createDataFrame([(1,), (2,), (2,)], ["k"])
    b = spark.createDataFrame([(2,), (3,)], ["k"])
    assert [r.k for r in setops.intersect_distinct(a, b).collect()] == [2]
    assert [r.k for r in setops.except_distinct(a, b).collect()] == [1]
    assert sorted(r.k for r in setops.intersect_all(a, b).collect()) == [2]


def test_grouped_agg_builders_and_rounding(spark):
    df = spark.createDataFrame(
        [("x", 1.005), ("x", 2.005), ("y", 10.0)], ["grp", "v"]
    )
    out = agg.grouped_agg(
        df,
        ("grp",),
        [("count", "v", "n"), ("sum_exact", "v", "total"), ("avg_exact", "v", "mean")],
        round_to=2,
    ).orderBy("grp").collect()
    assert (out[0].n, out[0].total, out[0].mean) == (2, 3.01, 1.51)
    assert (out[1].n, out[1].total) == (1, 10.0)


def test_derived_key_agg_franchise_flag(spark):
    # reference A1 (kpis.py:125-142): when/otherwise grouping key
    df = spark.createDataFrame(
        [("Coll A", 1.0), (None, 2.0), (None, 4.0)], ["collection", "roi"]
    )
    key = F.when(F.col("collection").isNotNull(), "Franchise").otherwise("Standalone")
    out = agg.derived_key_agg(df, key, "kind", [("avg", "roi", "mean_roi")]).orderBy("kind").collect()
    assert [(r.kind, r.mean_roi) for r in out] == [("Franchise", 1.0), ("Standalone", 3.0)]


def test_percentile_exact_is_exact(spark):
    df = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4)], ["v"])
    assert df.select(agg.percentile_exact("v", 0.5).alias("p")).first().p == 2.5


def test_hll_mergeable_rollup_matches_exact(spark, sf_smoke):
    """Unioned day-sketches must estimate month-level distincts within HLL
    error (lgK=14 -> ~0.4% rel. std err); the query's own within_2pct gate
    must agree with the exact column it ships."""
    from tmdb_spark_data_pipeline_spark.plans.queries import hll_mergeable_rollup
    from tmdb_spark_data_pipeline_spark.sources.io import load_table
    import pyspark.sql.functions as F

    rows = hll_mergeable_rollup(spark, sf_smoke).collect()
    got = {(r.month, r.event_type): r for r in rows}
    ev = load_table(spark, sf_smoke, "events")
    exact = {
        (r.month, r.event_type): r.n
        for r in ev.groupBy(
            F.date_format(F.date_trunc("month", F.col("ts")), "yyyy-MM").alias("month"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, r in got.items():
        assert r.n_exact == exact[k], (k, r.n_exact, exact[k])
        assert r.within_2pct, k
