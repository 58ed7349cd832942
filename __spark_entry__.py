"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``tmdb_spark_data_pipeline_spark.plans.queries`` — the
declared query surface (SURVEY.md §2.11), each written once in PySpark and
once in DuckDB SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tmdb_spark_data_pipeline_spark.plans.queries import (  # noqa: E402
    all_oracles,
    all_queries,
    revenue_by_region,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: multi-table star join + decimal-exact
    grouped revenue (revenue_by_region)."""
    return revenue_by_region(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return all_oracles()
