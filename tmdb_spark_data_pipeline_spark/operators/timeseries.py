"""Time-series regularization: dense time grids, gap filling, forward fill.

Event logs are sparse (an hour with no purchases has no row); downstream
consumers (charts, anomaly detectors, feature windows) need a dense regular
series. The grid is generated with ``sequence()`` + ``explode`` — Catalyst
expressions, no driver-side date loop, no UDF.

Scale posture: the grid is |keys| × |buckets| — tiny relative to the events
that produced the aggregate (the aggregate happens BEFORE the grid join, so
the join's left side is already shrunk to per-bucket rows). Forward fill is
one window pass per key ordered by bucket; skew bound = buckets per key,
which is fixed by the time range, not the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_grid(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    *,
    step: str = "1 hour",
) -> DataFrame:
    """Dense (key..., bucket) grid: every ``step`` bucket between the
    GLOBAL min and max of ``ts_col``, for every distinct key combination.
    Cross join of two tiny aggregates (distinct keys × exploded bucket
    sequence) — both sides are post-aggregation small, so the cross join is
    a broadcast of counts, never of events."""
    bounds = df.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("__lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("__hi"),
    )
    buckets = bounds.select(
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket")
    )
    return df.select(*keys).distinct().crossJoin(F.broadcast(buckets))


def gap_fill(
    agg: DataFrame,
    keys: tuple[str, ...],
    bucket_col: str,
    grid: DataFrame,
    *,
    zero_cols: tuple[str, ...] = (),
    ffill_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Left-join a sparse per-bucket aggregate onto a dense grid, then fill:
    ``zero_cols`` → missing buckets become 0 (counts/sums); ``ffill_cols`` →
    missing buckets carry the last observed value forward per key (gauges /
    last-known-state).

    Forward fill is ``last(ignorenulls)`` over an unbounded-preceding window
    per key — one shuffle on the keys, which the grid join already required.
    """
    joined = grid.join(agg, [*keys, bucket_col], "left")
    out = joined
    for c in zero_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if ffill_cols:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(bucket_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in ffill_cols:
            out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def change_intervals(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    state_col: str,
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an event stream into SCD2-style validity intervals: per key,
    consecutive rows with the same ``state_col`` merge into one row with
    ``valid_from`` (first ts) / ``valid_to`` (next state's first ts, null for
    the current state) — the dimension-history builder.

    Two window passes over the same (keys) partitioning — Catalyst reuses one
    sort+exchange for both, so it costs a single shuffle keyed by ``keys``:
    (1) a change flag via ``lag(state)``, turned into a run id by a running
    sum; (2) per-run min/max via groupBy, then ``lead(valid_from)`` for the
    closing timestamp. Skew bound = events per key.

    ``tiebreak`` orders same-timestamp events deterministically (an id
    column); required whenever ``ts_col`` isn't unique per key.
    """
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.when(
        F.lag(F.col(state_col)).over(w).isNull()
        | (F.lag(F.col(state_col)).over(w) != F.col(state_col)),
        1,
    ).otherwise(0)
    runs = df.select(
        *keys,
        F.col(ts_col),
        F.col(state_col),
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("__run"),
    )
    spans = runs.groupBy(*keys, "__run").agg(
        F.first(F.col(state_col)).alias(state_col),
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col("__run").asc())
    return spans.select(
        *keys,
        state_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


def hourly_gap_filled(
    events: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Dense hourly series per key: event count (zero-filled) and last
    observed hourly total (forward-filled) — the aggregate-then-regularize
    composition: events collapse to per-hour rows first, the dense grid and
    fills touch only |keys|×|hours| rows."""
    bucket = F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    agg = events.groupBy(*keys, bucket).agg(
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("hour_total"),
    )
    grid = time_grid(events, keys, ts_col, step="1 hour")
    return gap_fill(
        agg, keys, "bucket", grid, zero_cols=("n_events",), ffill_cols=("hour_total",)
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    *,
    window: int = 20,
    min_obs: int = 10,
) -> DataFrame:
    """Per-key rolling z-score of ``value_col`` against the PRECEDING
    ``window`` observations (the current row excluded — a self-exclusive
    baseline, so an outlier can't mask itself) — the streaming-friendly
    anomaly/feature signal a monitoring or feature-engineering pipeline
    computes per entity.

    Determinism contract (DuckDB-oracle parity): the rolling mean/variance
    come from DECIMAL(30,6) windowed sums of value and value², so the window
    aggregates are bit-identical in any engine regardless of accumulation
    order; only the final scalar arithmetic is double. ``order_cols`` must
    be a total order per key (include a unique id) or frame contents are
    engine-dependent. Rows with fewer than ``min_obs`` preceding
    observations get NULL z (cold start).

    One window pass per key — a single hash-partition shuffle on the key;
    skew bound = events per entity. Adds column ``z``.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    dv = F.col(value_col).cast("decimal(30,6)")
    dv2 = (F.col(value_col) * F.col(value_col)).cast("decimal(30,6)")
    n = F.count(dv).over(w)
    s1 = F.sum(dv).over(w).cast("double")
    s2 = F.sum(dv2).over(w).cast("double")
    nn = n.cast("double")
    mean = s1 / nn
    var = (s2 - (s1 * s1) / nn) / (nn - F.lit(1.0))
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(
        (n >= min_obs) & (std > 0), (F.col(value_col) - mean) / std
    )
    return df.withColumn("z", z)


def last_state(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    *,
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """CDC changelog apply (last-write-wins): collapse a change feed to the
    current state — the newest row per key under ``order_cols``; if ``op_col``
    is given, keys whose *final* operation equals ``delete_op`` drop out of
    the state entirely (a delete tombstone erases the key, it does not
    resurrect an older version).

    ``order_cols`` must be a total order per key (include a unique id as the
    last column) or "newest" is engine-dependent.

    Shape: the grouped top-1 window (§2.7) — one hash-partition shuffle on
    the key, per-partition sort, ``row_number`` cutoff at 1. At 100 TB this
    is the standard compaction pass over a CDC mirror; AQE skew splitting
    handles hot keys, and because the filter keeps exactly one row per key
    the output is |keys|, not |changes|.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        # Null-safe: a NULL final op is "unknown", not a tombstone — plain
        # `!=` evaluates to NULL for NULL ops and the filter would silently
        # drop those keys from the state.
        out = out.filter(~F.col(op_col).eqNullSafe(delete_op))
    return out


def ewma_finite(
    df: DataFrame,
    value_col: str,
    order_col: str,
    *,
    alpha: float = 0.2,
    window: int = 30,
    out_col: str = "ewma",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Finite-horizon exponentially weighted moving average: over the trailing
    ``window`` observations (frame order = ``order_col`` asc), weight the
    i-th-newest value by ``(1-alpha)**i`` and normalize by the realized weight
    mass ``(1 - (1-alpha)**m) / alpha`` (m = rows actually in the frame), so
    the series is unbiased from the first row — no warm-up NULLs, no infinite
    recursion. Truncating the horizon at ``window`` drops weight mass
    ``(1-alpha)**window`` (~0.1% at the defaults), the standard bounded-state
    EWMA used by monitoring systems.

    Determinism contract: the trailing values are collected in frame order
    (``collect_list`` over a running window appends in the window's sort
    order) and folded left-to-right, so both engines accumulate in the same
    sequence; outputs should still be rounded at a fixed scale because
    ``pow`` may differ in the last ulp across libm implementations.

    Shape: one window pass. Unpartitioned it is a single-partition sort —
    correct for an already-aggregated global series (|days|-scale, which is
    what a dashboard EWMA smooths); per-entity EWMAs pass ``partition_cols``
    and shuffle once on the key like any §2.7 window.
    """
    lam = 1.0 - alpha
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(-(window - 1), 0)
    )
    xs = F.collect_list(F.col(value_col).cast("double")).over(w)
    m = F.size(xs)
    weighted = F.zip_with(
        xs,
        F.reverse(F.sequence(F.lit(0), m - 1)),
        lambda x, e: x * F.pow(F.lit(lam), e.cast("double")),
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x)
    den = (F.lit(1.0) - F.pow(F.lit(lam), m.cast("double"))) / F.lit(alpha)
    return df.withColumn(out_col, num / den)
