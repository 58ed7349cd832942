"""Grouped aggregation operators (SURVEY.md §2.4 A1-A7).

The reference's three group-by families (``analytics/kpis.py:125-180``) and
the yearly trend (``visualization/visualize.py:114-120``) generalize to one
parameterized hash-aggregate builder. All aggregates are Spark built-ins →
partial (map-side) aggregation + whole-stage codegen for free; no UDAFs.

Determinism: money-typed double sums/means go through decimal
(``functions.money_sum``) so partial-agg order can't flip a rounded digit —
see that docstring for the 100 TB rationale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ColumnOrName, _col, money_avg, money_sum

#: name → aggregate builder. Each takes a column and returns an expression.
AGG_BUILDERS = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "sum_exact": lambda c: money_sum(c),
    "avg_exact": lambda c: money_avg(c),
    "median": lambda c: F.median(c),
    "stddev": lambda c: F.stddev(c),
    "count_distinct": lambda c: F.count_distinct(c),
    "approx_count_distinct": lambda c: F.approx_count_distinct(c),
}


def grouped_agg(
    df: DataFrame,
    group_cols: tuple[ColumnOrName, ...],
    aggs: list[tuple[str, str, str]],
    *,
    round_to: int | None = None,
) -> DataFrame:
    """``groupBy(group_cols).agg(...)`` from ``(agg_name, column, alias)``
    triples (reference A1-A3 pattern, ``kpis.py:125-180``).

    ``round_to`` applies to non-count aggregates, mirroring the reference's
    ``round(..., 2)`` on every Gold metric (``kpis.py:134-138``).
    """
    exprs: list[Column] = []
    for agg_name, column, alias in aggs:
        e = AGG_BUILDERS[agg_name](column)
        if round_to is not None and agg_name not in ("count", "count_distinct", "approx_count_distinct"):
            e = F.round(e.cast("double"), round_to)
        exprs.append(e.alias(alias))
    return df.groupBy(*[_col(g) for g in group_cols]).agg(*exprs)


def percentile_exact(c: ColumnOrName, p: float) -> Column:
    """Exact percentile — used in declared queries instead of
    ``percentile_approx`` so the DuckDB oracle (``quantile_cont``) matches
    (SURVEY.md §7 hard parts). ``percentile_approx`` remains available for
    the 100 TB path where exactness isn't required."""
    return F.percentile(_col(c), F.lit(p))


def derived_key_agg(
    df: DataFrame,
    key_expr: Column,
    key_alias: str,
    aggs: list[tuple[str, str, str]],
    *,
    round_to: int | None = None,
) -> DataFrame:
    """Group by a derived key (reference A1's franchise flag built with
    ``when(isNotNull, ...)`` at ``kpis.py:128-131``, A4's ``year(release_date)``
    at ``visualize.py:114-120``)."""
    return grouped_agg(
        df.withColumn(key_alias, key_expr),
        (key_alias,),
        aggs,
        round_to=round_to,
    )


def combine_rollups(
    parts: list[DataFrame],
    keys: tuple[str, ...],
    *,
    sum_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Merge pre-aggregated rollups — incremental view maintenance.

    Each part is an already-aggregated table over the same ``keys`` whose
    measure columns are MERGEABLE partials: counts/sums re-add, maxes/mins
    re-extremize. ``union`` then one re-aggregate gives exactly the rollup
    of the concatenated inputs, so yesterday's materialized rollup plus
    today's delta rollup replaces a full recompute — the pattern that turns
    a daily 100 TB scan into a 1 TB scan of the new partition.

    Decimal/exact measures keep the merge bit-exact regardless of how the
    history was split (addition is associative for decimals and integers;
    callers should aggregate doubles through ``decimal`` partials first,
    as ``money_sum`` does). Averages and other non-mergeable measures must
    travel as (sum, count) pairs and divide after the merge.
    """
    if not parts:
        raise ValueError("combine_rollups needs at least one part")
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.max(c).alias(c) for c in max_cols]
        + [F.min(c).alias(c) for c in min_cols]
    )
    return merged.groupBy(*keys).agg(*aggs)
