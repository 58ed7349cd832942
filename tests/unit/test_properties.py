"""Property-based operator tests (hypothesis) — a layer the reference lacks
(SURVEY §5: no property tests there). Each property checks the Spark operator
against a plain-Python model on small random inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import cleaning, rank, setops
from tmdb_spark_data_pipeline_spark.sources.io import register_views

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=-100, max_value=100),  # tiebreak/metric
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(rows=rows_strategy)
def test_dedup_by_key_keeps_min_by_tiebreak(spark, rows):
    df = spark.createDataFrame(rows, "k int, t int, v double")
    got = {(r.k, r.t) for r in cleaning.dedup_by_key(df, ("k",), tiebreak=(F.col("t"), F.col("v"))).collect()}
    expect = {}
    for k, t, v in sorted(rows, key=lambda r: (r[0], r[1], (r[2] is None, r[2]))):
        expect.setdefault(k, (k, t))
    assert got == set(expect.values())
    assert len(got) == len({k for k, _, _ in rows})  # exactly one row per key


@SETTINGS
@given(rows=rows_strategy, k=st.integers(min_value=1, max_value=8))
def test_top_k_matches_python_model(spark, rows, k):
    df = spark.createDataFrame(rows, "k int, t int, v double")
    got = [(r.k, r.t) for r in rank.top_k(df, "v", order="desc", k=k, tiebreak=("k", "t")).collect()]
    model = sorted(rows, key=lambda r: (r[2] is None, -(r[2] or 0), r[0], r[1]))[:k]
    assert got == [(m[0], m[1]) for m in model]


@SETTINGS
@given(
    a=st.lists(st.integers(0, 20), max_size=20),
    b=st.lists(st.integers(0, 20), max_size=20),
)
def test_setops_match_python_sets(spark, a, b):
    da = spark.createDataFrame([(x,) for x in a], "v int")
    db = spark.createDataFrame([(x,) for x in b], "v int")
    assert {r.v for r in setops.intersect_distinct(da, db).collect()} == set(a) & set(b)
    assert {r.v for r in setops.except_distinct(da, db).collect()} == set(a) - set(b)
    assert {r.v for r in setops.union_by_name([da, db], distinct=True).collect()} == set(a) | set(b)


@SETTINGS
@given(rows=rows_strategy, n=st.integers(min_value=0, max_value=3))
def test_completeness_filter_matches_python_model(spark, rows, n):
    df = spark.createDataFrame(rows, "k int, t int, v double")
    got = cleaning.completeness_filter(df, n).count()
    expect = sum(1 for r in rows if sum(x is not None for x in r) >= n)
    assert got == expect


def test_declared_surface_is_sql_queryable(spark, sf_smoke):
    # SURVEY §1.4: tables register as temp views, so the surface is also
    # plain spark.sql
    register_views(spark, sf_smoke)
    out = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1
        """
    )
    assert out.count() > 0
