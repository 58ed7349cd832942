#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/<dir>/.

Usage: python tools/capture_plans.py <plans_dir> <suffix> <name> [<name> ...]

Plan capture only — builds each query's DataFrame and writes the formatted
physical plan; it does not execute the query through the sink (queries that
materialize artifacts inside their builder still run those writes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdb_spark_data_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from tmdb_spark_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    plans_dir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    sc = spark.sparkContext
    mode = sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        out = os.path.join(plans_dir, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} chars)", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
