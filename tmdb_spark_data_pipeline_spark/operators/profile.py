"""Table profiling: per-column null/distinct/min/max summary in ONE pass.

Data-quality reconnaissance for pipeline inputs (the step before committing a
100 TB read to a transform): every column's null count, exact distinct count,
and min/max, computed in a single aggregate over one scan — then unpivoted to
one row per column.

Scale posture: one scan, one (global) aggregation. Exact ``count(distinct)``
per column compiles to Spark's `Expand` (one pass, |cols|× row fan-out before
partial aggregation) — exact answers, predictable cost. For very wide or
ultra-high-cardinality tables the `approx_` variant swaps in HLL sketches
(`approx_count_distinct`, map-side partial agg, no fan-out) — same output
schema, rows-only checkable (sketches have no cross-engine twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: tuple[str, ...] | None = None, *, approx: bool = False) -> DataFrame:
    """→ one row per column: ``(column, n_rows, n_nulls, n_distinct,
    min_value, max_value)`` with min/max cast to string (engine-neutral
    presentation; nulls excluded by Spark/SQL min-max semantics).

    ``approx=True`` replaces the exact distinct with
    ``approx_count_distinct`` — the 100 TB default.
    """
    cols = cols or tuple(df.columns)
    distinct = (
        F.approx_count_distinct if approx else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            distinct(c).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args: list[str] = []
    for c in cols:
        stack_args.append(f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}")
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column",
        "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )
