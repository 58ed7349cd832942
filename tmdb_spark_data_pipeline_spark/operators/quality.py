"""Declarative data-quality expectations (dbt-test / Great-Expectations
shape, Spark-first): a rule list compiles into ONE aggregate pass over the
table — no per-rule scans — plus one anti-join per referential rule.

Row-level rules (not_null / accepted_values / in_range / unique) become
conditional counters inside a single ``agg``: at 100 TB the whole rule set
costs one corpus scan with map-side partial aggregation, which is the
difference between "run the checks nightly" and "skip the checks". The
``relationship`` (foreign-key) rule is a broadcast anti-join per target —
the dimension side is small by construction.

Output: one row per rule — ``(rule, column, n_violations, passed)`` — the
table a CI gate or freshness dashboard consumes directly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    kind: str  # not_null | unique | accepted_values | in_range | relationship
    column: str
    values: tuple | None = None  # accepted_values
    lo: float | None = None  # in_range (inclusive)
    hi: float | None = None
    ref: DataFrame | None = None  # relationship target
    ref_column: str | None = None


def not_null(column: str) -> Rule:
    return Rule("not_null", column)


def unique(column: str) -> Rule:
    return Rule("unique", column)


def accepted_values(column: str, values: tuple) -> Rule:
    return Rule("accepted_values", column, values=tuple(values))


def in_range(column: str, lo: float, hi: float) -> Rule:
    return Rule("in_range", column, lo=lo, hi=hi)


def relationship(column: str, ref: DataFrame, ref_column: str) -> Rule:
    return Rule("relationship", column, ref=ref, ref_column=ref_column)


def expect(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; single scan for row-level rules (one ``agg``
    with a counter column per rule), one broadcast anti-join per
    ``relationship`` rule. Violation semantics:

    - ``not_null``: NULL rows
    - ``unique``: rows beyond the first per value (count - countDistinct;
      NULLs don't violate uniqueness — pair with ``not_null`` if they should)
    - ``accepted_values``: non-NULL rows outside the set
    - ``in_range``: non-NULL rows outside [lo, hi]
    - ``relationship``: non-NULL rows whose value is absent from the target
    """
    if not rules:
        raise ValueError("expect() requires at least one Rule")
    spark = df.sparkSession
    counters = []
    labels: list[tuple[str, str]] = []
    for r in rules:
        c = F.col(r.column)
        if r.kind == "not_null":
            counters.append(F.sum(c.isNull().cast("long")))
        elif r.kind == "unique":
            counters.append(F.count(c) - F.countDistinct(c))
        elif r.kind == "accepted_values":
            counters.append(
                F.sum((c.isNotNull() & ~c.isin(*r.values)).cast("long"))
            )
        elif r.kind == "in_range":
            counters.append(
                F.sum((c.isNotNull() & ((c < r.lo) | (c > r.hi))).cast("long"))
            )
        elif r.kind == "relationship":
            continue  # handled below
        else:
            raise ValueError(f"unknown rule kind {r.kind!r}")
        labels.append((r.kind, r.column))
    rows: list[DataFrame] = []
    if counters:
        agg = df.agg(*[cnt.alias(f"__c{i}") for i, cnt in enumerate(counters)])
        stack = F.array(
            *[
                F.struct(
                    F.lit(k).alias("rule"),
                    F.lit(col).alias("column"),
                    F.coalesce(F.col(f"__c{i}"), F.lit(0)).alias("n_violations"),
                )
                for i, (k, col) in enumerate(labels)
            ]
        )
        rows.append(
            agg.select(F.explode(stack).alias("r")).select(
                "r.rule", "r.column", "r.n_violations"
            )
        )
    for r in rules:
        if r.kind != "relationship":
            continue
        orphans = (
            df.select(F.col(r.column))
            .filter(F.col(r.column).isNotNull())
            .join(
                F.broadcast(r.ref.select(F.col(r.ref_column).alias(r.column))),
                r.column,
                "left_anti",
            )
            .agg(F.count("*").alias("n_violations"))
            .select(
                F.lit("relationship").alias("rule"),
                F.lit(r.column).alias("column"),
                "n_violations",
            )
        )
        rows.append(orphans)
    out = rows[0]
    for extra in rows[1:]:
        out = out.unionByName(extra)
    _ = spark  # session retained for future sinks (e.g. expectation history)
    return out.withColumn("passed", F.col("n_violations") == 0)
