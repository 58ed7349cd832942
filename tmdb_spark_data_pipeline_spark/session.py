"""SparkSession factory for the engine.

The reference (``/root/reference``) hardcodes ``spark.sql.shuffle.partitions=4``
and pins Spark 3.5.1 (``docker/Dockerfile:1``, ``transform/clean_transform.py:180``).
We instead rely on AQE for shuffle sizing and pin the semantics that matter for
correctness parity with a DuckDB oracle:

- ``spark.sql.ansi.enabled=false``: Spark 3.5 default (the reference's pinned
  version). With ANSI on (Spark 4.x default), ``x / 0`` throws
  ``DIVIDE_BY_ZERO``; with it off, ``x / 0`` is NULL — which matches DuckDB
  and the reference's observed behavior.
- ``spark.sql.session.timeZone=UTC``: DuckDB timestamps are UTC-naive; pinning
  the session TZ makes window/time-bucket results comparable.
- AQE on (coalesce partitions + skew join): at 100 TB the right shuffle
  partition count is data-dependent; hardcoding it (as the reference does) is
  wrong at both ends of the scale.
- Arrow on: the only sanctioned pandas bridge is post-aggregation
  ``toPandas()`` (reference ``visualization/visualize.py:56-57``), and Arrow
  makes it columnar instead of row-pickled.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "tmdb-spark-data-pipeline-spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller leaves it unset and spark-submit provides it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local mode: ~cores. On a cluster AQE coalesces from this initial
        # value, so a generous initial count is safe.
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Local mode runs driver + every executor thread in ONE JVM; Spark's
        # 1g default heap starves 32 cores (GCLocker alloc stalls under any
        # persisted table). Applies only when this factory launches the JVM —
        # a cluster deployment sizes executors via spark-submit instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Whole-stage codegen emits several JIT-compiled classes PER QUERY
        # PLAN; a session that executes hundreds of distinct plans (the bench
        # sweep, a notebook, a long-lived service) fills the JVM's default
        # 240 MB code cache, after which the JIT stops compiling new hot
        # loops and heavy queries run partially interpreted (measured: the
        # same query 2-3× slower late in a 161-query sweep than isolated,
        # at 0% CPU steal). Spark's own tuning guide recommends raising it.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
            ),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Scale-dependent overrides stay parameterised (optimization-round rule:
    # no constant tuned to one machine): SPARK_GRAFT_EXTRA_CONF is a
    # semicolon-separated k=v list applied to every engine session — used
    # for cluster-posture settings and isolated config A/Bs without
    # touching the bench harness.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, (p.strip() for p in env_conf.split(";"))):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def free_local_checkpoint(df) -> None:
    """Deterministically drop the block-manager blocks backing a
    ``localCheckpoint``-ed DataFrame.

    ``localCheckpoint`` persists the materialized RDD in the block manager
    and Spark only reclaims it when the JVM object is garbage-collected
    (ContextCleaner) — nondeterministic through the Py4J reference chain, so
    a ``foreachBatch`` epoch loop that checkpoints per-epoch state
    accumulates one superseded copy per epoch for the life of the stream
    (ADVICE r11). This frees the blocks the moment the caller knows the
    checkpoint is dead. ONLY call it on a checkpoint that will never be
    read again: a locally checkpointed RDD has no lineage to recompute
    from, so any later read of ``df`` fails.

    Best-effort by design: the analyzed plan of a checkpointed DataFrame is
    a ``LogicalRDD`` whose ``rdd()`` accessor is the persisted RDD; a pure
    column PROJECTION of a checkpointed frame (``connected_components``
    returns one) is a ``Project``/``SubqueryAlias`` chain over the
    ``LogicalRDD`` — descend through those single-child wrappers so callers
    holding the projection can still free the blocks. If the plan is
    anything else (caller passed a non-checkpointed frame) this is a no-op
    and the ContextCleaner path still applies.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        for _ in range(8):  # bounded descent through projection wrappers
            name = plan.getClass().getSimpleName()
            if name == "LogicalRDD":
                plan.rdd().unpersist(False)
                return
            if name in ("Project", "SubqueryAlias") and plan.children().size() == 1:
                plan = plan.children().head()
            else:
                return
    except Exception:
        pass  # fall back to GC-driven ContextCleaner reclamation


@contextmanager
def cache_scope(spark: SparkSession) -> Iterator[SparkSession]:
    """Bound the lifetime of operator-internal ``persist()`` calls.

    Several operators (LSH banding, SimHash buckets, candidate pair tables)
    persist small intermediates because Spark does not reuse exchanges across
    self-join sides. Those cache entries live in the JVM CacheManager, which
    is keyed by logical plan and NOT released when the Python ``DataFrame``
    is garbage-collected — a long-lived session composing these operators
    accumulates cache without bound (measured: a 127-query sweep inflated
    later heavy queries 2-3×). Wrap each unit of work::

        with cache_scope(spark):
            pairs = minhash_lsh_pairs(df, "text", "doc_id")
            pairs.write.parquet(out)

    On exit every cached table in the session is dropped. The scope is
    session-global (Spark has no finer-grained cache namespace), so don't
    nest scopes around work whose caches must outlive the inner scope.
    ``bench.py`` applies the same policy by clearing the cache between
    timed queries.
    """
    try:
        yield spark
    finally:
        spark.catalog.clearCache()
