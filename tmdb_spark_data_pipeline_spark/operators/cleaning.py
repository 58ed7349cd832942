"""Cleaning / normalization operators (SURVEY.md §2.2 P8-P10, §2.8 F6-F8).

The reference's ``transform_bronze`` (``transform/clean_transform.py:67-173``)
as composable, parameterized functions. Deviations (documented per
SURVEY.md §7 "hard parts"):

- ``dedup_by_key`` keeps a *deterministic* row (min by tie-breaker) instead of
  ``dropDuplicates``'s arbitrary choice (``clean_transform.py:153``).
- casts are driven by an explicit name→type map, mirroring
  ``src/schemas.py:176-184`` / ``clean_transform.py:116-119``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import ColumnOrName, _col, null_sentinels, nullif_le_zero


def filter_equals(df: DataFrame, column: str, value) -> DataFrame:
    """P1 (``clean_transform.py:72-73``) — guarded equality filter."""
    if column not in df.columns:
        return df
    return df.filter(F.col(column) == value)


def drop_columns(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """P2 (``clean_transform.py:76-77``)."""
    return df.drop(*[c for c in cols if c in df.columns])


def project(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """P3 (``clean_transform.py:161-171``) — canonical column order."""
    return df.select(*[c for c in cols if c in df.columns])


def cast_columns(df: DataFrame, cast_map: dict[str, str]) -> DataFrame:
    """F7 (``clean_transform.py:116-119``; map at ``src/schemas.py:176-184``)."""
    exprs: list[Column] = []
    for c in df.columns:
        exprs.append(F.col(c).cast(cast_map[c]).alias(c) if c in cast_map else F.col(c))
    return df.select(*exprs)


def null_non_positive(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """F6 threshold nulling (``clean_transform.py:124-129``): budget/revenue/
    runtime ≤ 0 are TMDB sentinels, not data."""
    for c in cols:
        if c in df.columns:
            df = df.withColumn(c, nullif_le_zero(c))
    return df


def null_when_unsupported(df: DataFrame, target: str, support: str, min_support: int = 1) -> DataFrame:
    """F6 (``clean_transform.py:140-143``): NULL ``vote_average`` when
    ``vote_count`` is below a support floor — a rating nobody cast isn't 0.0."""
    return df.withColumn(
        target,
        F.when(F.col(support) >= min_support, F.col(target)).otherwise(F.lit(None)),
    )


def replace_sentinels(df: DataFrame, cols: tuple[str, ...], sentinels: tuple[str, ...] = ("No Data",)) -> DataFrame:
    """F6 (``clean_transform.py:146-150``)."""
    for c in cols:
        if c in df.columns:
            df = df.withColumn(c, null_sentinels(c, sentinels))
    return df


def dropna_required(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """P10 (``clean_transform.py:154``)."""
    return df.dropna(subset=list(cols))


def completeness_filter(df: DataFrame, min_non_null: int, cols: tuple[str, ...] | None = None) -> DataFrame:
    """P8 (``clean_transform.py:157-158``): keep rows with ≥ N non-null cells.

    Pure column arithmetic — stays in whole-stage codegen; no UDF.
    """
    use = cols if cols is not None else tuple(df.columns)
    score = sum(F.col(c).isNotNull().cast("int") for c in use)
    return df.filter(score >= min_non_null)


def upsert_by_key(
    existing: DataFrame,
    updates: DataFrame,
    keys: tuple[str, ...],
) -> DataFrame:
    """SCD1-style upsert without a table format: updates win over existing
    rows with the same key; unmatched rows pass through.

    ``unionByName`` + windowed keep-first — one shuffle on the key. The
    reference approximates this with parquet append + downstream dedup
    (``fetch_movies.py:313`` + ``clean_transform.py:153``); this makes the
    precedence explicit and deterministic. (With a transactional format —
    Delta/Iceberg, the reference's own named future work — this becomes
    MERGE INTO; same logical semantics.)
    """
    tagged = updates.withColumn("__prio", F.lit(0)).unionByName(
        existing.withColumn("__prio", F.lit(1))
    )
    return dedup_by_key(tagged, keys, tiebreak=(F.col("__prio"),)).drop("__prio")


def dedup_by_key(
    df: DataFrame,
    keys: tuple[str, ...],
    tiebreak: tuple[ColumnOrName, ...] = (),
) -> DataFrame:
    """P9 with a deterministic keep-policy.

    The reference's ``dropDuplicates(["id"])`` keeps an arbitrary row. Here:
    ``row_number() over (partition by keys order by tiebreak) = 1``. One
    shuffle on the key — same cost as dropDuplicates' partial-agg, but
    reproducible (required for oracle hash-matching, and the right semantics
    for an idempotent pipeline).

    With no tiebreak columns given, falls back to native ``dropDuplicates``
    (cheaper: map-side partial aggregation) — caller accepts nondeterminism.
    """
    if not tiebreak:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*[_col(t).asc() for t in tiebreak])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
