"""Physical-plan assertions — the 100 TB posture checks (SURVEY.md §7):
filters/projections reach the parquet scan, dimension joins broadcast,
global top-k avoids a full sort. These guard the *plan*, not just results."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.plans import queries


def _plan(df) -> str:
    # explain("formatted") prints untruncated scan details (PushedFilters,
    # ReadSchema); toString() abbreviates long fields
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_filter_project_pushes_down(spark, sf_smoke):
    df = queries.scan_filter_project(spark, sf_smoke)
    plan = _plan(df)
    assert "PushedFilters:" in plan and "GreaterThan(l_discount" in plan
    # column pruning: the 16-col lineitem scan reads only what's projected
    assert "l_comment" not in plan.split("ReadSchema")[-1]


def test_revenue_by_region_broadcasts_dimensions(spark, sf_smoke):
    plan = _plan(queries.revenue_by_region(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


def test_top_orders_plan_is_take_ordered(spark, sf_smoke):
    plan = _plan(queries.top_orders_by_price(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan


def test_anti_join_plan_broadcasts(spark, sf_smoke):
    plan = _plan(queries.customers_without_orders(spark, sf_smoke))
    assert "LeftAnti" in plan


def test_partitioned_roundtrip_prunes_partitions(spark, sf_smoke):
    # the read-back filter on the partition column must become a
    # PartitionFilters entry (directory pruning), NOT a data filter
    df = queries.partitioned_roundtrip(spark, sf_smoke)
    plan = _plan(df)
    scan = plan[plan.index("PartitionFilters") :]
    assert "o_orderpriority" in scan.split("\n")[0]


def test_lsh_probe_uses_dynamic_partition_pruning(spark, sf_smoke):
    import os
    import tempfile

    from pyspark.sql import functions as F

    from tmdb_spark_data_pipeline_spark.operators import similarity
    from tmdb_spark_data_pipeline_spark.sources.io import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    path = os.path.join(tempfile.gettempdir(), "spark_graft_dpp_probe_test")
    similarity.write_lsh_partitioned_corpus(emb, path)
    probe = similarity.cosine_topk_lsh_probe(emb.filter(F.col("vec_id") < 3), path, k=5)
    plan = _plan(probe)
    # corpus scan must be gated by a runtime pruning predicate on the bucket
    # partition column (only probed buckets' files are read)
    assert "dynamicpruning" in plan.lower()


def test_ivf_artifact_probe_uses_dynamic_partition_pruning(spark, sf_smoke):
    import os
    import tempfile

    from pyspark.sql import functions as F

    from tmdb_spark_data_pipeline_spark.operators import similarity
    from tmdb_spark_data_pipeline_spark.sources.io import load_table

    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    path = os.path.join(tempfile.gettempdir(), "spark_graft_ivf_dpp_test")
    similarity.write_ivf_artifact(emb, path)
    out = similarity.cosine_topk_ivf_from_artifact(
        spark, path, emb.filter(F.col("vec_id") < 3), k=5, nprobe=2
    )
    plan = _plan(out)
    # the persisted-index serving path: the cell-partitioned corpus scan is
    # gated by a runtime pruning predicate on cell_id — only probed cells'
    # partition directories are read (the O(nprobe·N/cells) claim)
    assert "dynamicpruning" in plan.lower()


def test_blocked_neardup_is_equi_join_not_nested_loop(spark, sf_smoke):
    plan = _plan(queries.cosine_neardups_blocked(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" not in plan  # the unblocked baseline's shape


def test_registry_integrity():
    # every oracle references only declared tables; every query has a
    # callable; names are unique by construction (dict)
    assert len(queries.REGISTRY) >= 50
    for name, spec in queries.REGISTRY.items():
        assert callable(spec.fn), name
        if spec.oracle is not None:
            assert spec.oracle.strip().upper().startswith(("SELECT", "WITH", "--")), name


def test_salted_join_shuffles_on_key_plus_salt(spark):
    from tmdb_spark_data_pipeline_spark.operators import joins

    left = spark.range(1000).select(F.col("id").alias("k"), F.col("id").alias("p"))
    right = spark.range(100).select(F.col("id").alias("k"), F.col("id").alias("t"))
    # disable auto-broadcast so the exchange is observable
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joins.salted_join(left, right, "k", salt=4))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
    # the shuffle key must include the salt column — that IS the rewrite
    assert "__salt" in plan and "hashpartitioning(k" in plan


def test_contamination_benchmark_side_broadcasts(spark, sf_smoke):
    from tmdb_spark_data_pipeline_spark.operators import dedup
    from tmdb_spark_data_pipeline_spark.sources.io import load_table

    docs = load_table(spark, sf_smoke, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    plan = _plan(dedup.contamination_overlap(train, bench, "text", "doc_id"))
    assert "BroadcastHashJoin" in plan  # train side never shuffles for the join


def test_multiprobe_lsh_is_equi_join(spark, sf_smoke):
    plan = _plan(queries.similarity_topk_multiprobe(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_disjunctive_join_broadcasts_and_derives_filters(spark, sf_smoke):
    # part broadcasts; Catalyst derives the single-side implications of the
    # OR-of-ANDs and pushes a quantity range down to the lineitem scan
    plan = _plan(queries.disjunctive_part_revenue(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_bigram_top20_is_take_ordered(spark, sf_smoke):
    plan = _plan(queries.bigram_merge_candidates(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan


def test_chunking_has_no_exchange(spark, sf_smoke):
    # explode(sequence)+slice is a narrow fan-out: no shuffle anywhere
    plan = _plan(queries.chunk_sliding_windows(spark, sf_smoke))
    assert "Exchange" not in plan


def test_top_supplier_joins_dim_after_rank_filter(spark, sf_smoke):
    # the supplier dim joins broadcast, and only after the rnk=1 filter
    plan = _plan(queries.top_supplier_by_quarter(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


def test_zorder_key_locality_and_range(spark):
    from pyspark.sql import functions as F

    from tmdb_spark_data_pipeline_spark.operators import layout

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (255, 255)], ["a", "b"]
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", layout.zorder_key("a", "b").alias("z")).collect()
    }
    # bit i of a -> position 2i; bit i of b -> 2i+1
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(255, 255)] == 0xFFFF


def test_write_zordered_roundtrip_sorted(spark, tmp_path):
    import pyspark.sql.functions as F

    from tmdb_spark_data_pipeline_spark.operators import layout

    df = spark.range(0, 1000).select(
        F.col("id").alias("a"), (F.lit(999) - F.col("id")).alias("b"), F.col("id").alias("v")
    )
    path = str(tmp_path / "zord")
    layout.write_zordered(df, path, ("a", "b"), bits=10, modulus=1024)
    back = spark.read.parquet(path)
    assert back.count() == 1000 and set(back.columns) == {"a", "b", "v"}
    # within every parquet file the z-key must be non-decreasing (the layout
    # contract that makes row-group min/max tight)
    z = layout.zorder_key(F.pmod("a", F.lit(1024)), F.pmod("b", F.lit(1024)), bits=10)
    files = back.withColumn("__f", F.input_file_name()).withColumn("__z", z)
    from pyspark.sql import Window

    w = Window.partitionBy("__f").orderBy(F.monotonically_increasing_id())
    viol = (
        files.withColumn("__prev", F.lag("__z").over(w))
        .filter(F.col("__prev").isNotNull() & (F.col("__z") < F.col("__prev")))
        .count()
    )
    assert viol == 0


def test_runtime_bloom_filter_join_pruning(spark, sf_smoke):
    """Spark's runtime bloom-filter join pruning (on by default in 4.x)
    injects a might_contain(bloom_filter_agg(...)) filter on the FACT side of
    a selective join once the fact scan crosses the size threshold. The
    thresholds are sized for cluster scans (10 GB application side) — scaled
    to 0 here to pin the plan shape the 100 TB deployment gets for free."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # broadcast joins use DPP instead
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_smoke}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_kmeans_assignment_has_no_window_sort(spark, sf_smoke):
    """The argmin is a partial-agg'd min(struct), not a row_number window —
    the |corpus|×k replication must collapse map-side."""
    from tmdb_spark_data_pipeline_spark.operators import similarity
    from tmdb_spark_data_pipeline_spark.sources.io import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    cents = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    plan = _plan(similarity.assign_nearest(emb, cents))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_unigram_logprob_no_cartesian_on_counts(spark, sf_smoke):
    """The token↔count join must be an equi-join (broadcast or shuffled),
    never a nested loop; only the two scalar stats cross-join."""
    from tmdb_spark_data_pipeline_spark.plans import queries as q

    import re

    plan = _plan(q.unigram_logprob_scores(spark, sf_smoke))
    # count operator entries, not tree echo lines
    joins = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M)
    # exactly the one scalar broadcast (n, v) may nested-loop
    assert len(joins) <= 1, joins


def test_stream_static_dim_broadcasts(spark, sf_smoke):
    """The static dim side of the stream-static join must broadcast (the
    stream side never shuffles for the join)."""
    import os

    from tmdb_spark_data_pipeline_spark.sources.io import load_table
    from tmdb_spark_data_pipeline_spark.streaming.windows import (
        _as_event_time,
        stream_from_parquet_dir,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_smoke, "events.parquet")
    schema = spark.read.parquet(path).schema
    stream = stream_from_parquet_dir(
        spark, os.path.dirname(path), schema, glob_filter="events.parquet"
    )
    cust = load_table(spark, sf_smoke, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = _as_event_time(stream, "ts").join(F.broadcast(cust), "user_id")
    # streaming plans can't be physically planned pre-start; the analyzed
    # logical plan carries the broadcast hint that micro-batch planning honors
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint (strategy=broadcast)" in plan


def test_zorder_key_n_three_columns(spark):
    from tmdb_spark_data_pipeline_spark.operators import layout

    df = spark.createDataFrame([(1, 0, 0), (0, 1, 0), (0, 0, 1), (7, 7, 7)], ["a", "b", "c"])
    got = {
        (r.a, r.b, r.c): r.z
        for r in df.select(
            "a", "b", "c", layout.zorder_key_n(["a", "b", "c"], bits=3).alias("z")
        ).collect()
    }
    # bit i of col j -> position i*3+j
    assert got[(1, 0, 0)] == 1
    assert got[(0, 1, 0)] == 2
    assert got[(0, 0, 1)] == 4
    assert got[(7, 7, 7)] == 0b111111111


def test_zorder_key_n_guards(spark):
    import pytest

    from tmdb_spark_data_pipeline_spark.operators import layout

    with pytest.raises(ValueError, match="at least two"):
        layout.zorder_key_n(["a"])
    with pytest.raises(ValueError, match="overflows"):
        layout.zorder_key_n(["a", "b", "c", "d"], bits=16)


def test_compact_parquet_dir_reduces_files(spark, tmp_path):
    from tmdb_spark_data_pipeline_spark.operators import layout

    path = str(tmp_path / "frag")
    # simulate a fragmented sink: 20 tiny files
    spark.range(0, 2000).repartition(20).write.parquet(path)
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 20
    n = layout.compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    after = glob.glob(f"{path}/*.parquet")
    assert n == 1 and len(after) == 1
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(2000))


def test_boilerplate_stats_single_corpus_scan(spark, sf_smoke):
    # window-count restructure: doc frequency comes from count() OVER
    # (PARTITION BY shingle), so the scan -> split -> shingle pipeline runs
    # once — the old groupBy+rejoin shape scanned the corpus twice
    plan = _plan(queries.boilerplate_exposure(spark, sf_smoke))
    # one "Location:" line per scan node detail block — the "Scan parquet"
    # string itself appears twice per node (tree line + detail header)
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Window" in plan


def test_write_zordered_wide_domain_keeps_range_pruning(spark, tmp_path):
    """Without a modulus, wide domains reduce by RIGHT-SHIFT (high bits):
    order-preserving, so each written file covers a near-disjoint range of
    the raw column and min/max row-group pruning survives. (pmod bucketing
    would interleave values from the whole domain into every file.)"""
    import pyspark.sql.functions as F

    from tmdb_spark_data_pipeline_spark.operators import layout

    n, bits = 1_000_000, 10
    df = spark.range(0, n, 997).select(
        F.col("id").alias("a"), F.lit(7).alias("b"), F.col("id").alias("v")
    )
    path = str(tmp_path / "zord_wide")
    layout.write_zordered(df, path, ("a", "b"), bits=bits, num_files=4)
    back = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    spans = back.groupBy("__f").agg(F.min("a").alias("lo"), F.max("a").alias("hi")).collect()
    assert len(spans) > 1, "need multiple files to test disjointness"
    shift_granularity = 1 << max(0, (n - 1).bit_length() - bits)
    ordered = sorted(((r.lo, r.hi) for r in spans))
    for (lo1, hi1), (lo2, hi2) in zip(ordered, ordered[1:]):
        # consecutive files may share at most one shifted bucket
        assert lo2 >= hi1 - shift_granularity, (ordered, shift_granularity)


def test_chunk_dedup_single_corpus_scan(spark, sf_smoke):
    # same single-scan contract as boilerplate stats: occurrence counts come
    # from count() OVER (PARTITION BY digest), so the scan -> tokenize ->
    # chunk pipeline runs once, and the window shuffle carries digests, not
    # chunk text
    plan = _plan(queries.chunk_dedup_stats(spark, sf_smoke))
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Window" in plan
    assert "chunk_text" not in plan.split("Exchange")[-1]


def test_weighted_sample_plan_is_take_ordered(spark, sf_smoke):
    """A-ES weighted sampling must compile to TakeOrderedAndProject
    (per-partition top-k heaps), never a global Sort."""
    plan = _plan(queries.weighted_sample_docs(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan


def test_session_path_windows_share_one_user_exchange(spark, sf_smoke):
    """The (user_id) window and the (user_id, run) window must share one
    hash exchange: HashPartitioning(user_id) satisfies the clustered
    distribution on (user_id, run), so sessionization + path leads cost a
    single shuffle of the events; only the tiny path-count aggregate adds
    its own."""
    plan = _plan(queries.session_path_trigrams(spark, sf_smoke))
    # all three windows (session flag, run sum, trigram leads) hang off ONE
    # hashpartitioning(user_id) exchange; the only other exchange is the
    # tiny path-count aggregate's
    assert plan.count("hashpartitioning(user_id") == 1


def test_semantic_dedup_pair_join_is_equi_join(spark, sf_smoke):
    """Cluster-blocked pair enumeration must be an equi-join on the cell id
    (sort-merge/shuffled-hash), never the all-pairs nested loop. The ONLY
    nested-loop joins allowed in the plan are kmeans' deliberate
    broadcast-centroid assigns (tiny build side by construction); the pair
    join itself — the one that would be N² — must be key-based."""
    plan = _plan(queries.semantic_dedup_pairs(spark, sf_smoke))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    # nested loops only where a BroadcastExchange feeds them (centroid
    # assign); formatted explain prints each node twice (tree line with the
    # "Inner BuildRight" qualifier + bare detail header)
    assert plan.count("BroadcastNestedLoopJoin") == 2 * plan.count(
        "BroadcastNestedLoopJoin Inner BuildRight"
    )


def test_heavy_hitter_candidate_pass_is_map_only(spark, sf_smoke):
    """The sketch pass itself must not shuffle the token stream: the only
    exchanges in the candidate subtree are for the summary merge (grouped
    sum over ≤counters rows per batch), downstream of the Arrow map."""
    from tmdb_spark_data_pipeline_spark.operators import sketch, text
    from tmdb_spark_data_pipeline_spark.sources.io import load_table

    docs = load_table(spark, sf_smoke, "documents")
    toks = docs.select(F.explode(text.tokens("text")).alias("token")).filter(
        F.col("token") != ""
    )
    plan = _plan(sketch.heavy_hitter_candidates(toks, "token", counters=80))
    # exactly one exchange NODE: the candidate-summary groupBy; the token
    # stream itself flows scan -> explode -> MapInPandas with no
    # repartitioning (formatted explain prints each node twice: tree + detail)
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "MapInPandas" in plan


_BOUNDING_AGGS = ("HashAggregateExec", "ObjectHashAggregateExec", "SortAggregateExec")


def _iter_physical_nodes(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _iter_physical_nodes(ch.apply(i))
    # subquery expressions carry their own plan trees (a scalar-subquery
    # BroadcastNestedLoopJoin is invisible via children())
    sq = node.subqueries()
    for i in range(sq.size()):
        yield from _iter_physical_nodes(sq.apply(i))
    # persisted intermediates hide their plan behind InMemoryRelation —
    # descend so a cached cartesian can't evade the invariant
    cls = node.getClass().getSimpleName()
    if cls == "InMemoryTableScanExec":
        yield from _iter_physical_nodes(node.relation().cachedPlan())
    elif cls == "AdaptiveSparkPlanExec":
        yield from _iter_physical_nodes(node.inputPlan())


def _bnlj_builds_are_one_row(df) -> tuple[bool, int]:
    """(all nested-loop build sides provably emit ≤1 row, #BNLJ nodes).

    Walks the pre-AQE physical plan: for every ``BroadcastNestedLoopJoinExec``
    the build-side subtree's first row-bounding node (preorder) must be a
    GLOBAL aggregate (empty grouping → exactly 1 row) or a ``limit ≤ 1``
    (``TakeOrderedAndProject``/``GlobalLimit`` — the argmax-pick shape).
    A build side that reaches a scan/join/window first is NOT provably
    1-row and fails. This is the machine check behind ``SCALAR_NL_OK``:
    a whitelisted scalar-broadcast query that silently grows a real
    cartesian flips this to False and fails the registry invariant
    (VERDICT_r05 "What's wrong" #3)."""
    sp = df._jdf.queryExecution().sparkPlan()
    n_bnlj, all_ok = 0, True
    for n in _iter_physical_nodes(sp):
        if n.getClass().getSimpleName() != "BroadcastNestedLoopJoinExec":
            continue
        n_bnlj += 1
        build = n.left() if n.buildSide().toString() == "BuildLeft" else n.right()
        ok = False
        for m in _iter_physical_nodes(build):
            cls = m.getClass().getSimpleName()
            if cls in _BOUNDING_AGGS:
                ok = m.groupingExpressions().isEmpty()
                break
            if cls in ("TakeOrderedAndProjectExec", "GlobalLimitExec"):
                ok = m.limit() <= 1
                break
        all_ok = all_ok and ok
    return all_ok, n_bnlj


def test_registry_wide_plan_invariants(spark, sf_smoke):
    """Every declared query's physical plan obeys the engine-wide rules:

    - no row-at-a-time Python UDFs (``BatchEvalPython``) — Python only via
      Arrow (`MapInPandas`/`FlatMapGroupsInPandas`/`...WithState`)
    - no ``CartesianProduct`` anywhere
    - ``BroadcastNestedLoopJoin`` only in two DECLARED classes, split per
      VERDICT_r05 #3 (the old single whitelist let a scalar query grow a
      real cartesian silently):
      * ``SCALAR_NL_OK`` — 1-row scalar broadcasts (grand totals, avgdl,
        argmax picks). Additionally MACHINE-VERIFIED: every nested-loop
        build side must provably emit ≤1 row
        (``_bnlj_builds_are_one_row``), so these can never silently become
        an all-pairs join.
      * ``ALL_PAIRS_NL_OK`` — the declared all-pairs / declared-small
        broadcast shapes (exact correctness baselines, centroid assigns,
        probe sets, marginal grids), each documented in its docstring.
      Any other query with a nested loop fails outright — including the
      ~25 formerly-whitelisted queries whose plans carry no nested loop
      at all today (removed from the lists; a regression now trips).

    Streaming queries are checked on their batch-plan twin where they expose
    one; pure-streaming replays are skipped (their operators are pinned by
    the streaming tests)."""
    from tmdb_spark_data_pipeline_spark.plans.queries import REGISTRY

    # Nested loops whose build sides are all 1-row scalars — verified, not
    # trusted (see _bnlj_builds_are_one_row).
    SCALAR_NL_OK = {
        "unigram_viterbi_stats",        # scalar inventory-total broadcast (piece costs)
        "unigram_em_round",             # same scalar totals, both EM passes
        "event_type_hour_mutual_info",  # scalar n broadcast
        "basket_item_lift",             # scalar order-count broadcast
        "tfidf_top_terms",              # scalar doc-count broadcast
        "bm25_search_top20",            # scalar avgdl broadcast
        "unigram_logprob_scores",       # scalar corpus-size broadcast
        "key_skew_profile",             # scalar total broadcast
        "idle_customer_balances",       # scalar avg-acctbal threshold (Q22 shape)
        "important_brand_value",        # scalar avg-revenue threshold (ref KPI)
        "source_mixture_weights",
        "mixture_temperature_weights",  # scalar sqrt-sum + total broadcast
        "revenue_pareto_deciles",       # scalar grand-total broadcast
        "bigram_heldout_logprob",       # scalar vocab-size broadcast
        "bigram_kneser_ney_heldout",    # scalar type-count + vocab-size broadcasts
        "hourly_gap_filled_series",     # scalar min/max bounds for the grid
        "pmi_collocations_top20",       # scalar totals
        "classifier_agreement_kappa",   # scalar contingency-totals broadcast
        "token_budget_waterfill",       # scalar total + cap broadcasts
        "curriculum_token_budgets",     # same waterfill scalar broadcasts over lang x tier cells
        "order_price_psi",              # scalar period-totals broadcast
        "temporal_split_embargo",       # scalar overlap-count broadcast
        "kfold_balance_audit",          # scalar grand-total broadcast
        "quality_quantile_normalized",  # scalar N broadcast
        "benford_price_audit",          # scalar total broadcast
        "copurchase_triangle_stats",    # scalar stats broadcasts
        "hll_overlap_users",            # 1-row sketch/scalar broadcasts
        "theta_segment_algebra",        # 1-row sketch/scalar broadcasts
        "daily_revenue_changepoint",    # scalar mean/sums + 1-row argmax pick
        "time_to_purchase_km",          # scalar subject-count broadcast
        "copurchase_pagerank",          # 1-row node-count broadcast per round
        "brand_parts_ppr",              # 1-row seed-count broadcast per round
        "copurchase_weighted_pagerank",  # 1-row node-count broadcast per round
        "dsir_importance_selection",    # scalar LM-totals broadcast
        "embedding_source_calibration",  # 1-row global-centroid broadcast
        "minhash_blocking_quality",     # 1-row cand-count/precision broadcast
        "ab_test_cuped",                # 1-row pooled theta/mean broadcast
        "customer_spend_theil",         # 1-row global N/mean broadcast
    }
    # Declared all-pairs / declared-small broadcast shapes (docstrings).
    ALL_PAIRS_NL_OK = {
        "cosine_neardups",          # exact all-pairs correctness baseline
        "similarity_topk",          # brute-force exactness baseline
        "similarity_topk_ivf",      # broadcast-centroid assign
        "ivf_artifact_roundtrip",   # same broadcast-centroid assign, served from the artifact
        "ivf_artifact_incremental", # same assign shape, built old + appended new vs frozen cells
        "ivf_recall_audit",         # broadcast-centroid assign + declared exact-baseline leg
        "ivf_recall_trained",       # same audit, kmeans-trained cells (broadcast assign x iters)
        "kmeans_cluster_profile",   # broadcast-centroid assign
        "semantic_dedup_pairs",     # broadcast-centroid assign
        "embedding_truncation_fidelity",  # broadcast probe-pairs (declared)
        "knn_label_disagreement",   # brute-force probe pairs (declared)
        "jl_projection_fidelity",   # broadcast probe pairs (declared)
        "lang_source_chisq",        # marginal-product grid (|langs|x|sources|)
        "hybrid_search_rrf",        # scalar avgdl + broadcast probe pairs
        "bm25_ndcg_eval",           # same BM25 scalar + broadcast rankings
        "truncation_rank_stability",  # broadcast probe + <=20-row pair join
        "truncation_rank_rbo",      # broadcast probe + <=20-row tables
        "neardup_method_agreement",  # contains the cosine all-pairs baseline leg (cached)
        "embedding_knn_label_spread",  # all-pairs kNN build on the bounded subset
        "embedding_dbscan_clusters",   # all-pairs eps-graph on the bounded subset
        "er_blocking_quality",         # all-pairs TRUTH leg on the declared %10 stratum
        "embedding_mutual_reach_clusters",  # all-pairs mr-graph on the bounded subset
        "embedding_mutual_reach_ann",  # exact-twin audit leg on the bounded subset
        "embedding_mutual_reach_hierarchy",  # all-pairs mr list on the bounded subset
        "embedding_mutual_reach_hierarchy_ann",  # exact-leg audit on the bounded subset
        "hard_negative_mining",        # broadcast bounded probe side (declared)
        "pq_adc_recall",               # declared exact-baseline leg over the bounded query stratum
        "similarity_topk_ivfpq",       # broadcast-centroid assigns (coarse + PQ) + declared exact leg
        "ivfpq_artifact_roundtrip",    # same assign shapes at build + the same declared exact audit leg
        "similarity_topk_ivfpq_residual",  # residual variant: same assigns + declared exact leg
        "ivfpq_artifact_incremental",  # frozen-quantizer append: same assign shapes + declared exact audit leg
    }
    from tmdb_spark_data_pipeline_spark.plans.queries import (
        STREAM_REPLAY_ONLY,
        stream_batch_twins,
    )

    # streaming queries: probed via their BATCH TWIN (same hoisted build
    # function over batch inputs — VERDICT_r05 #5); only the replay-only
    # set (streaming-only APIs, reasons recorded at the definition) is
    # skipped, and the partition must be exhaustive so a new stream query
    # can't silently dodge the invariant
    twins = stream_batch_twins()
    streaming = {n for n in REGISTRY if n.startswith("stream_")}
    unpartitioned = streaming - set(twins) - set(STREAM_REPLAY_ONLY)
    assert not unpartitioned, (
        f"stream queries neither twin-probed nor declared replay-only: {unpartitioned}"
    )
    # queries with write side-effects exercised elsewhere
    SIDE_EFFECT = {
        "json_roundtrip", "csv_roundtrip", "orc_roundtrip", "xml_roundtrip",
        "partitioned_roundtrip", "zorder_key_sample", "bucketed_join_revenue",
        "multimodal_features", "pyds_jsonl_roundtrip",
    }
    offenders: dict[str, str] = {}
    probes = {n: spec.fn for n, spec in REGISTRY.items() if n not in streaming}
    probes.update(twins)
    for name, fn in probes.items():
        if name in SIDE_EFFECT:
            continue
        df = fn(spark, sf_smoke)
        plan = _plan(df)
        if "BatchEvalPython" in plan:
            offenders[name] = "row-at-a-time Python UDF"
        elif "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan:
            if name in ALL_PAIRS_NL_OK:
                pass  # declared; shape documented in the query docstring
            elif name in SCALAR_NL_OK:
                ok, _ = _bnlj_builds_are_one_row(df)
                if not ok:
                    offenders[name] = "whitelisted as scalar but a nested-loop build side is not provably 1-row"
            else:
                offenders[name] = "undeclared BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_scalar_nl_checker_catches_nonscalar_mutation(spark):
    """The VERDICT_r05 'deliberate mutation' proof: a scalar-broadcast
    crossJoin passes the build-side check; the same query mutated to
    broadcast a multi-row table (the feared silent cartesian) fails it."""
    base = spark.range(0, 100).select(F.col("id").alias("k"))
    scalar = base.crossJoin(F.broadcast(base.agg(F.sum("k").alias("total"))))
    ok, n = _bnlj_builds_are_one_row(scalar)
    assert n == 1 and ok
    pick = base.crossJoin(F.broadcast(base.orderBy(F.col("k").desc()).limit(1)))
    ok, n = _bnlj_builds_are_one_row(pick)
    assert n == 1 and ok  # 1-row argmax pick counts as scalar
    mutated = base.crossJoin(F.broadcast(base.filter(F.col("k") < 50)))
    ok, n = _bnlj_builds_are_one_row(mutated)
    assert n == 1 and not ok  # multi-row build side → flagged


def test_correlated_scalar_subquery_decorrelates(spark, sf_smoke):
    """The WHERE-clause scalar subquery must rewrite to aggregate + join —
    never a per-outer-row subplan (no Subquery node survives in the
    physical plan) and never a nested loop over orders x orders."""
    plan = _plan(queries.above_customer_avg_orders(spark, sf_smoke))
    assert "HashAggregate" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Subquery" not in plan


def test_lateral_limit_plans_as_partitioned_topk(spark, sf_smoke):
    """LATERAL ... ORDER BY ... LIMIT must not become a nested loop; Spark
    rewrites it onto the per-key shuffle + selection shape."""
    plan = _plan(queries.lateral_top2_orders(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cm_sketch_counter_build_is_single_grouped_pass(spark, sf_smoke):
    """The Count-Min counter table must be one explode + one grouped count —
    no joins, no extra exchanges beyond the groupBy."""
    from tmdb_spark_data_pipeline_spark.operators import sketch, text
    from tmdb_spark_data_pipeline_spark.sources.io import load_table

    toks = (
        load_table(spark, sf_smoke, "documents")
        .select(F.explode(text.tokens("text")).alias("token"))
        .filter(F.col("token") != "")
    )
    plan = _plan(sketch.cm_sketch(toks, "token", width=64, depth=4))
    assert "Join" not in plan
    assert plan.count("Arguments: hashpartitioning") == 1  # the groupBy only


def test_bloom_probe_joins_broadcast_bit_table(spark, sf_smoke):
    """The Bloom probe must join the (<=2048-row) set-bit table as a
    BROADCAST hash join on the position key — the probe side never
    shuffles, which is the entire point of a pre-join filter."""
    plan = _plan(queries.bloom_prejoin_audit(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bpe_merge_rejoin_broadcasts(spark):
    """The BPE merge pass must rejoin the (tiny) selected-candidate map via
    BroadcastHashJoin — a sort-merge rejoin re-shuffles the full token
    stream every round (measured 13.3s -> 4.6s at sf0.1 when this was
    fixed). The final stream's plan carries the last round's rejoin."""
    from tmdb_spark_data_pipeline_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "a a b a b c"), (2, "b a b a a")], "doc_id long, text string"
    )
    _rules, stream = T.bpe_train_encode(df, "text", "doc_id", merges=1)
    plan = stream._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_run_tmp_cleanup_registration_and_stale_sweep(spark, tmp_path, monkeypatch):
    """_run_tmp hygiene (ADVICE r10 + r11): the per-application scratch tree
    is atexit-registered for removal, and foreign leftovers are swept on
    first use ONLY when provably idle — a dir whose top-level mtime is old
    is still spared if (a) a shallow walk finds recent activity two levels
    down (a live streaming checkpointLocation writes there without bumping
    the top-level mtime), or (b) its owning application advertises a fresh
    heartbeat (a live app whose artifact is read-only since startup)."""
    import os
    import time

    import tempfile as _tempfile

    monkeypatch.setattr(_tempfile, "gettempdir", lambda: str(tmp_path))
    app_id = spark.sparkContext.applicationId
    # force re-registration under the patched tempdir
    queries._TMP_CLEANUP_APPS.discard(app_id)

    old = time.time() - 2 * 86400
    stale = tmp_path / "spark_graft_otherapp_oldtag_sf0"
    fresh = tmp_path / "spark_graft_liveapp_tag_sf0"
    # live streaming checkpoint shape: old top-level dir, fresh write two
    # levels down (ckpt/commits/42) — only `commits`'s mtime moves
    deepfresh = tmp_path / "spark_graft_streamapp_ckpt_sf0"
    (deepfresh / "commits").mkdir(parents=True)
    (deepfresh / "commits" / "42").write_text("x")
    os.utime(deepfresh, (old, old))
    # read-only-since-startup artifact, owner heartbeat fresh (YARN-style
    # appId with underscores — prefix matching must still find it)
    hb_owned = tmp_path / "spark_graft_application_123_0001_art_sf0"
    hb_owned.mkdir()
    os.utime(hb_owned, (old, old))
    (tmp_path / "spark_graft_application_123_0001_heartbeat").write_text("")
    stale.mkdir()
    fresh.mkdir()
    os.utime(stale, (old, old))

    p = queries._run_tmp(spark, "t", "/root/testdata/sf0.001")
    assert f"spark_graft_{app_id}_t_sf0.001" in p
    assert not stale.exists()  # swept: foreign + idle >24h, no heartbeat
    assert fresh.exists()  # spared: foreign but fresh
    assert deepfresh.exists()  # spared: fresh activity found by shallow walk
    assert hb_owned.exists()  # spared: owner heartbeat is fresh
    # this application's own heartbeat beacon is touched per call
    assert (tmp_path / f"spark_graft_{app_id}_heartbeat").exists()
    # idempotent: second call doesn't re-register or error
    assert queries._run_tmp(spark, "t", "/root/testdata/sf0.001") == p
