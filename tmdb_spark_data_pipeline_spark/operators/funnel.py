"""Event-sequence analytics: ordered funnels and cohort retention.

The events-table counterpart of the reference's KPI layer (SURVEY.md §2.11
item 13 extension): product-analytics primitives over an append-only event
log, expressed so one shuffle (on ``user_id``) does all the per-user
sequencing work.

Scale posture: both operators aggregate-before-join/window — per-user
conditional mins and per-user-day distinct activity shrink the data to
|users| (or |user-days|) before anything wide happens. No self-joins per
step: an N-step funnel is N stacked conditional window mins over ONE
partitioning (one exchange, N expression passes), not N-1 joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_step_times(
    events: DataFrame,
    steps: tuple[str, ...],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per user: the timestamp each ordered funnel step was first completed
    (``step_1_ts .. step_N_ts``), where step i counts only STRICTLY AFTER
    step i-1's time — the ordered-sequence semantics (a purchase before the
    first view does not convert the view funnel).

    One shuffle: all step columns are conditional mins over the same
    ``user_col`` partitioning, resolved left-to-right. NULL propagates: a
    user missing step i has NULL for every later step.
    """
    w = Window.partitionBy(user_col)
    out = events
    prev: Column | None = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        col_name = f"step_{i}_ts"
        out = out.withColumn(col_name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(col_name)
    return (
        out.select(user_col, *[f"step_{i}_ts" for i in range(1, len(steps) + 1)])
        .distinct()
    )


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary → one row per step: ``(step_index, step, n_users)``
    with ``n_users`` = users whose first completion of this step happened
    after their completion of every prior step."""
    times = funnel_step_times(
        events, steps, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    aggs = [
        F.count(F.col(f"step_{i}_ts")).alias(f"__n_{i}")
        for i in range(1, len(steps) + 1)
    ]
    wide = times.agg(*aggs)
    rows = ", ".join(
        f"{i}, '{step}', __n_{i}" for i, step in enumerate(steps, start=1)
    )
    return wide.select(
        F.expr(f"stack({len(steps)}, {rows}) AS (step_index, step, n_users)")
    ).select(
        F.col("step_index").cast("int"),
        "step",
        F.col("n_users").cast("long"),
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention: ``(cohort_day, day_offset, n_users)`` — of the
    users whose FIRST event fell on ``cohort_day``, how many were active
    ``day_offset`` days later.

    Aggregate-before-join discipline: events collapse to distinct
    ``(user, day)`` activity first (the big shrink — shuffle on user), the
    per-user min day is a window over that reduced set, and the final count
    groups |user-days|, not |events|.
    """
    day = F.to_date(F.col(ts_col))
    activity = events.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    w = Window.partitionBy("u")
    offs = activity.withColumn("cohort_day", F.min("d").over(w)).select(
        "u",
        "cohort_day",
        F.datediff(F.col("d"), F.col("cohort_day")).alias("day_offset"),
    )
    if max_offset is not None:
        offs = offs.filter(F.col("day_offset") <= max_offset)
    return (
        offs.groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )
