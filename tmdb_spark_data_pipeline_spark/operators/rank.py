"""Top-k / ranking operators (SURVEY.md §2.5 T1-T4, §2.7).

Generalizes the reference's ``rank_movies`` (``analytics/kpis.py:65-76``):
derive → optional filter → ``orderBy().limit(k)``. Catalyst rewrites the
global form to ``TakeOrderedAndProject`` (no full sort, no single-node
bottleneck — each partition keeps k rows, the driver merges P*k rows).

Determinism fixes over the reference (SURVEY.md §2.5): explicit
``nulls_last`` on the metric and a total-order tie-breaker column, so results
hash-match a DuckDB ``ORDER BY metric DESC NULLS LAST, id LIMIT k``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import (
    ColumnOrName,
    _col,
    asc_nulls_last_with_tiebreak,
    desc_nulls_last_with_tiebreak,
)


def _order(metric: ColumnOrName, order: str, tiebreak: tuple[ColumnOrName, ...]) -> list[Column]:
    if order == "desc":
        return desc_nulls_last_with_tiebreak(metric, *tiebreak)
    if order == "asc":
        return asc_nulls_last_with_tiebreak(metric, *tiebreak)
    raise ValueError(f"order must be 'asc' or 'desc', got {order!r}")


def top_k(
    df: DataFrame,
    metric: ColumnOrName,
    *,
    order: str = "desc",
    k: int = 5,
    tiebreak: tuple[ColumnOrName, ...] = (),
    filter_expr: Column | None = None,
) -> DataFrame:
    """Global deterministic top-k (reference T1, ``kpis.py:65-76``).

    ``orderBy(...).limit(k)`` → ``TakeOrderedAndProject``: scales to
    arbitrarily many partitions because only k rows per partition survive
    the local sort.
    """
    if filter_expr is not None:
        df = df.filter(filter_expr)
    return df.orderBy(*_order(metric, order, tiebreak)).limit(k)


def top_n_per_group(
    df: DataFrame,
    group_cols: tuple[ColumnOrName, ...],
    metric: ColumnOrName,
    *,
    order: str = "desc",
    n: int = 3,
    tiebreak: tuple[ColumnOrName, ...] = (),
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-n per group via ``row_number()`` (SURVEY.md §2.7 — the natural
    generalization the reference lacks).

    One shuffle on the group key; the window sort is per-partition. For
    skewed group keys at scale, AQE skew handling applies to the exchange;
    an alternative two-phase (per-partition pre-top-n, then final) is not
    needed because row_number's partial sort already bounds state per group.
    """
    w = Window.partitionBy(*[_col(g) for g in group_cols]).orderBy(*_order(metric, order, tiebreak))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )
