"""Bucketed-join test: pre-bucketing both sides on the join key eliminates
the shuffle (SCALE.md's fact⋈fact strategy), asserted on the physical plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.sources.io import write_bucketed_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("custkey"), (F.col("id") % 7).alias("total")
    )
    customers = spark.range(0, 200).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    write_bucketed_table(orders, "t_orders_b", ("custkey",), 4)
    write_bucketed_table(customers, "t_customers_b", ("custkey",), 4)
    try:
        o, c = spark.table("t_orders_b"), spark.table("t_customers_b")
        # force a non-broadcast join so the shuffle question is real
        joined = o.hint("merge").join(c, "custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout reused, no shuffle
        assert joined.count() == 200
        # contrast: same join on unbucketed inputs DOES shuffle
        plain = orders.hint("merge").join(customers, "custkey")
        assert "Exchange" in _plan(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customers_b")
