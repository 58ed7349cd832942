"""Physical-plan assertions — the 100 TB posture checks (SURVEY.md §7):
filters/projections reach the parquet scan, dimension joins broadcast,
global top-k avoids a full sort. These guard the *plan*, not just results."""

from __future__ import annotations

import contextlib
import io

from tmdb_spark_data_pipeline_spark.plans import queries


def _plan(df) -> str:
    # explain("formatted") prints untruncated scan details (PushedFilters,
    # ReadSchema); toString() abbreviates long fields
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_filter_project_pushes_down(spark, sf_smoke):
    df = queries.scan_filter_project(spark, sf_smoke)
    plan = _plan(df)
    assert "PushedFilters:" in plan and "GreaterThan(l_discount" in plan
    # column pruning: the 16-col lineitem scan reads only what's projected
    assert "l_comment" not in plan.split("ReadSchema")[-1]


def test_revenue_by_region_broadcasts_dimensions(spark, sf_smoke):
    plan = _plan(queries.revenue_by_region(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


def test_top_orders_plan_is_take_ordered(spark, sf_smoke):
    plan = _plan(queries.top_orders_by_price(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan


def test_anti_join_plan_broadcasts(spark, sf_smoke):
    plan = _plan(queries.customers_without_orders(spark, sf_smoke))
    assert "LeftAnti" in plan


def test_registry_integrity():
    # every oracle references only declared tables; every query has a
    # callable; names are unique by construction (dict)
    assert len(queries.REGISTRY) >= 50
    for name, spec in queries.REGISTRY.items():
        assert callable(spec.fn), name
        if spec.oracle is not None:
            assert spec.oracle.strip().upper().startswith(("SELECT", "WITH", "--")), name
