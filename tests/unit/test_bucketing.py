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


def test_overwrite_preserves_old_table_on_failed_write(spark):
    """VERDICT_r05 #2: overwrite is write-first — a failing write must leave
    the previous table fully readable (the old pre-delete implementation
    destroyed it before writing)."""
    import pytest

    good = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("old").alias("v"))
    write_bucketed_table(good, "t_atomic", ("k",), 2)
    try:
        bad = spark.range(0, 10).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 5, F.lit("x"))
            .otherwise(F.raise_error(F.lit("boom")))
            .alias("v"),
        )
        with pytest.raises(Exception, match="boom"):
            write_bucketed_table(bad, "t_atomic", ("k",), 2)
        assert spark.table("t_atomic").count() == 10  # old table intact
        assert spark.table("t_atomic").filter(F.col("v") == "old").count() == 10
        # and a subsequent good overwrite still succeeds (staging junk cleared)
        good2 = spark.range(0, 7).select(F.col("id").alias("k"), F.lit("new").alias("v"))
        write_bucketed_table(good2, "t_atomic", ("k",), 2)
        assert spark.table("t_atomic").filter(F.col("v") == "new").count() == 7
    finally:
        spark.sql("DROP TABLE IF EXISTS t_atomic")
        spark.sql("DROP TABLE IF EXISTS t_atomic__overwrite_staging")


def test_overwrite_recovers_interrupted_rename(spark):
    """ADVICE r6: a crash in the window between DROP TABLE of the target
    and the staging→target rename leaves the newest data ONLY in the
    committed staging table. The next call must rename staging into place
    (recovery) instead of clearing it as junk — and the recovered data
    must then survive a subsequent FAILED overwrite (it plays the normal
    'previous table' role)."""
    import pytest

    newest = spark.range(0, 9).select(F.col("id").alias("k"), F.lit("newest").alias("v"))
    try:
        # simulate the crash window: committed staging table, no target
        write_bucketed_table(newest, "t_crash__overwrite_staging", ("k",), 2, mode="errorifexists")
        spark.sql("DROP TABLE IF EXISTS t_crash")
        assert not spark.catalog.tableExists("t_crash")

        # 1) a failing overwrite must FIRST recover staging→target, then
        #    leave the recovered table intact when its own write fails
        bad = spark.range(0, 4).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 2, F.lit("x"))
            .otherwise(F.raise_error(F.lit("boom")))
            .alias("v"),
        )
        with pytest.raises(Exception, match="boom"):
            write_bucketed_table(bad, "t_crash", ("k",), 2)
        assert spark.table("t_crash").filter(F.col("v") == "newest").count() == 9

        # 2) a good overwrite over the recovered table proceeds normally
        good = spark.range(0, 3).select(F.col("id").alias("k"), F.lit("next").alias("v"))
        write_bucketed_table(good, "t_crash", ("k",), 2)
        assert spark.table("t_crash").filter(F.col("v") == "next").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS t_crash")
        spark.sql("DROP TABLE IF EXISTS t_crash__overwrite_staging")


def test_overwrite_clears_stale_unregistered_location(spark):
    """In-memory catalog restart scenario: a table DIR survives in the
    warehouse with no catalog registration. Overwrite must clear the
    catalog-RESOLVED location and land the new table."""
    import os

    loc = os.path.join(
        spark.catalog.getDatabase(spark.catalog.currentDatabase()).locationUri.removeprefix(
            "file:"
        ),
        "t_stale",
    )
    os.makedirs(loc, exist_ok=True)
    open(os.path.join(loc, "orphan.parquet"), "w").write("junk")
    try:
        df = spark.range(0, 5).select(F.col("id").alias("k"))
        write_bucketed_table(df, "t_stale", ("k",), 2)
        assert spark.table("t_stale").count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS t_stale")


def test_overwrite_in_non_default_database_location(spark, tmp_path):
    """The cleared path must come from the owning DATABASE's locationUri,
    not a warehouse/<name> guess — pinned with a db at a custom location."""
    import os

    dbloc = str(tmp_path / "custom_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS altdb LOCATION '{dbloc}'")
    try:
        df = spark.range(0, 6).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        write_bucketed_table(df, "altdb.t_alt", ("k",), 2)
        write_bucketed_table(df, "altdb.t_alt", ("k",), 2)  # overwrite over itself
        assert spark.table("altdb.t_alt").count() == 6
        assert os.path.isdir(os.path.join(dbloc, "t_alt"))  # landed in the db's location
        # stale-dir path: drop registration surgically by recreating the dir
        spark.sql("DROP TABLE altdb.t_alt")
        os.makedirs(os.path.join(dbloc, "t_alt"), exist_ok=True)
        write_bucketed_table(df, "altdb.t_alt", ("k",), 2)
        assert spark.table("altdb.t_alt").count() == 6
    finally:
        spark.sql("DROP DATABASE IF EXISTS altdb CASCADE")
