"""Set operations (SURVEY.md §2.6) — unused by the reference, exposed by the
engine. Thin wrappers pinning the semantics (by-name resolution, distinct vs
all) that raw ``union`` leaves positional."""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_by_name(dfs: list[DataFrame], allow_missing: bool = False, distinct: bool = False) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=allow_missing)
    return out.distinct() if distinct else out


def except_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.subtract(right)


def intersect_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.intersect(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.exceptAll(right)


def intersect_all(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.intersectAll(right)
