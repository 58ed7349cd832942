"""Deterministic sampling / splitting / packing / PII-scrub tests
(SURVEY.md §2.11 item 13 extensions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import packing, sampling, text


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") * 7 % 100).alias("score"),
    )


def test_hash_split_is_deterministic_and_stable_under_append(spark):
    docs = _docs(spark)
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {r.doc_id: r.split for r in sampling.hash_split(docs, "doc_id", w).collect()}
    b = {r.doc_id: r.split for r in sampling.hash_split(docs, "doc_id", w).collect()}
    assert a == b
    # appending rows never moves an existing row across the boundary
    bigger = sampling.hash_split(_docs(spark, 400), "doc_id", w)
    big = {r.doc_id: r.split for r in bigger.collect()}
    assert all(big[k] == v for k, v in a.items())
    assert set(a.values()) == {"train", "val", "test"}


def test_hash_split_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        sampling.hash_split(_docs(spark), "doc_id", {"train": 0.5, "test": 0.1})


def test_hash_split_no_shuffle(spark):
    plan = sampling.hash_split(
        _docs(spark), "doc_id", {"a": 0.5, "b": 0.5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection


def test_stratified_sample_exact_counts(spark):
    docs = _docs(spark)  # 4 groups x 50 rows
    out = sampling.stratified_sample(docs, ("grp",), 0.1, "doc_id")
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 5, "1": 5, "2": 5, "3": 5}  # ceil(50 * 0.1) exactly
    again = sampling.stratified_sample(docs, ("grp",), 0.1, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_stratified_sample_small_stratum_never_empty(spark):
    docs = spark.createDataFrame([(1, "rare"), (2, "rare")], ["doc_id", "grp"])
    out = sampling.stratified_sample(docs, ("grp",), 0.01, "doc_id")
    assert out.count() == 1  # ceil(2 * 0.01) = 1: small strata stay represented


def test_rebalance_quota_keeps_top_scores(spark):
    out = sampling.rebalance_quota(_docs(spark), "grp", 3, "score", "doc_id")
    assert out.groupBy("grp").count().agg(F.max("count")).first()[0] == 3
    kept = {r.score for r in out.filter(F.col("grp") == "0").collect()}
    all_scores = sorted(
        (r.score for r in _docs(spark).filter(F.col("grp") == "0").collect()),
        reverse=True,
    )
    assert kept == set(all_scores[:3])


def test_pack_sequences_respects_start_offsets(spark):
    rows = [(i, "s", 100) for i in range(10)]  # 100 tokens each, budget 250
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tok"])
    out = packing.pack_sequences(df, "shard", "doc_id", "n_tok", 250).collect()
    by_id = {r.doc_id: (r.pack_start, r.pack_id) for r in out}
    assert by_id[0] == (0, 0)
    assert by_id[2] == (200, 0)  # starts inside pack 0
    assert by_id[3] == (300, 1)
    assert by_id[9] == (900, 3)


def test_pack_sequences_shards_are_independent(spark):
    rows = [(1, "a", 10), (2, "b", 10), (3, "a", 10)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tok"])
    out = {r.doc_id: r.pack_start for r in packing.pack_sequences(
        df, "shard", "doc_id", "n_tok", 100).collect()}
    assert out == {1: 0, 2: 0, 3: 10}


def test_whitespace_token_count_empty_text(spark):
    df = spark.createDataFrame([("",), ("  ",), ("a  b",)], ["t"])
    ns = [r.n for r in df.select(packing.whitespace_token_count("t").alias("n")).collect()]
    assert ns == [0, 0, 2]


def test_redact_pii_all_kinds(spark):
    t = "mail a@b.co or see https://x.io/p?q=c@d.ee from 10.0.0.1 tel +1 (555) 010-1234"
    df = spark.createDataFrame([(t,)], ["t"])
    red = df.select(text.redact_pii("t").alias("r")).first().r
    assert "<EMAIL>" in red and "<URL>" in red and "<IP>" in red and "<PHONE>" in red
    assert "a@b.co" not in red and "10.0.0.1" not in red
    # the email inside the URL redacts as URL, not EMAIL
    counts = df.select(*text.pii_counts("t")).first()
    assert (counts.n_url, counts.n_email, counts.n_ipv4, counts.n_phone) == (1, 1, 1, 1)


def test_redact_pii_plain_text_untouched(spark):
    t = "no pii here just words and the number 42"
    df = spark.createDataFrame([(t,)], ["t"])
    assert df.select(text.redact_pii("t").alias("r")).first().r == t


def test_chunk_by_tokens_windows_and_overlap(spark):
    # 10 tokens, max=4, overlap=1 -> stride 3 -> chunks at 0,3,6 cover to 10:
    # ceil((10-4)/3)+1 = 3 chunks; last chunk is the 4-token tail [t7..t10]
    toks = " ".join(f"t{i}" for i in range(1, 11))
    df = spark.createDataFrame([(1, toks), (2, "a b"), (3, "")], ["doc_id", "text"])
    out = packing.chunk_by_tokens(df, "doc_id", "text", max_tokens=4, overlap=1)
    rows = {(r.doc_id, r.chunk_id): (r.chunk_tokens, r.chunk_text) for r in out.collect()}
    assert rows[(1, 0)] == (4, "t1 t2 t3 t4")
    assert rows[(1, 1)] == (4, "t4 t5 t6 t7")
    assert rows[(1, 2)] == (4, "t7 t8 t9 t10")
    # short doc -> one whole chunk; empty doc -> one empty chunk
    assert rows[(2, 0)] == (2, "a b")
    assert rows[(3, 0)] == (0, "")
    assert len(rows) == 5


def test_chunk_by_tokens_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    try:
        packing.chunk_by_tokens(df, "doc_id", "text", max_tokens=4, overlap=4)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_negative_pairs_no_self_and_full_coverage(spark):
    from tmdb_spark_data_pipeline_spark.operators.sampling import negative_pairs

    df = spark.createDataFrame([(i * 10,) for i in range(7)], ["id"])
    out = negative_pairs(df, "id", k=3).collect()
    assert len(out) == 21  # every anchor gets exactly k slots
    for r in out:
        assert r.neg_id != r.anchor_id
        assert r.neg_id in {i * 10 for i in range(7)}
    # determinism: second run identical
    again = negative_pairs(df, "id", k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_pairs_needs_two_rows(spark):
    import pytest

    from tmdb_spark_data_pipeline_spark.operators.sampling import negative_pairs

    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match="at least two"):
        negative_pairs(df, "id")


def test_word_chunk_udtf_rows_and_edges(spark):
    spark.udtf.register("__wc4", packing.word_chunk_udtf(4))
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "  x "), (3, ""), (4, None)],
        "doc_id int, text string",
    )
    out = {
        (r.doc_id, r.chunk_idx): (r.n_words, r.first_word, r.last_word)
        for r in spark.sql(
            "SELECT d.doc_id, t.* FROM {d} d, LATERAL __wc4(d.text) t", d=df
        ).collect()
    }
    # doc 1: two chunks (4 + 2 words); doc 2: one single-word chunk after
    # empty-token stripping; docs 3/4 (empty / NULL text) emit nothing.
    assert out == {
        (1, 0): (4, "a", "d"),
        (1, 1): (2, "e", "f"),
        (2, 0): (1, "x", "x"),
    }


def test_word_chunk_udtf_rejects_nonpositive_size(spark):
    with pytest.raises(ValueError, match="chunk_words"):
        packing.word_chunk_udtf(0)


def test_waterfill_exhausts_budget_and_caps_fairly(spark):
    per = spark.createDataFrame(
        [("a", 100), ("b", 300), ("c", 1000), ("d", 5000)],
        "src string, n long",
    )
    out = {
        r.src: r
        for r in sampling.waterfill_allocations(per, "src", "n", 1400).collect()
    }
    # cap solves 100 + 300 + 2c = 1400 -> c = 500
    assert out["a"].allocated == 100.0 and not out["a"].capped
    assert out["b"].allocated == 300.0 and not out["b"].capped
    assert out["c"].allocated == 500.0 and out["c"].capped
    assert out["d"].allocated == 500.0 and out["d"].capped
    assert sum(r.allocated for r in out.values()) == 1400.0
    assert out["d"].cap == 500.0 and out["d"].epochs == 0.1


def test_waterfill_budget_covers_everything(spark):
    per = spark.createDataFrame([("a", 10), ("b", 20)], "src string, n long")
    out = {
        r.src: r
        for r in sampling.waterfill_allocations(per, "src", "n", 100).collect()
    }
    assert all(not r.capped and r.cap is None for r in out.values())
    assert out["a"].allocated == 10.0 and out["b"].allocated == 20.0


def test_waterfill_tiny_budget_caps_all(spark):
    per = spark.createDataFrame(
        [("a", 40), ("b", 40), ("c", 40), ("d", 40)], "src string, n long"
    )
    out = sampling.waterfill_allocations(per, "src", "n", 100).collect()
    # no prefix feasible -> istar=0 -> cap = 100/4 = 25 for everyone
    assert all(r.cap == 25.0 and r.allocated == 25.0 and r.capped for r in out)


def test_waterfill_requires_exactly_one_budget(spark):
    per = spark.createDataFrame([("a", 1)], "src string, n long")
    with pytest.raises(ValueError, match="exactly one"):
        sampling.waterfill_allocations(per, "src", "n")


def test_waterfill_zero_size_key_yields_null_epochs(spark):
    """ADVICE r5: a key with size 0 (a source whose documents are all
    empty) must produce an agreed NULL epochs, not a 0/0 engine
    divergence; it gets allocation 0 and is never counted as capped."""
    per = spark.createDataFrame(
        [("a", 0), ("b", 100), ("c", 900)], ["src", "n"]
    )
    out = {r.src: r for r in sampling.waterfill_allocations(per, "src", "n", 500).collect()}
    assert out["a"].allocated == 0.0
    assert out["a"].epochs is None
    assert out["a"].capped is False
    assert out["b"].epochs is not None
