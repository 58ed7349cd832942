"""Similarity-search tests (SURVEY.md §2.11 item 13): exact brute-force vs a
numpy oracle, LSH recall on its own buckets, near-dup pair threshold."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import similarity
from tmdb_spark_data_pipeline_spark.sources.io import load_table


@pytest.fixture(scope="module")
def vectors():
    rng = random.Random(7)
    vecs = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(30)]
    # plant a near-dup of vector 0 at index 29 (tiny perturbation)
    vecs[29] = [v + 0.001 for v in vecs[0]]
    return vecs


@pytest.fixture(scope="module")
def emb(spark, vectors):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)], ["vec_id", "embedding"]
    )


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_dot_and_norm(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [3.0, 0.0, 4.0])], ["a", "b"])
    row = df.select(
        similarity.dot("a", "b").alias("d"), similarity.l2_norm("a").alias("n")
    ).first()
    assert row.d == 11.0
    assert row.n == 3.0


def test_bruteforce_topk_matches_numpy_oracle(emb, vectors):
    out = similarity.cosine_topk_bruteforce(
        emb.filter("vec_id < 3"), emb, k=5
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.query_id, []).append((r.neighbor_id, r.cos))
    for q in range(3):
        expect = sorted(
            ((j, _cos(vectors[q], vectors[j])) for j in range(30) if j != q),
            key=lambda t: (-t[1], t[0]),
        )[:5]
        assert [n for n, _ in got[q]] == [n for n, _ in expect]
        for (_, a), (_, b) in zip(got[q], expect):
            assert abs(a - b) < 1e-9


def test_topk_excludes_self_and_respects_k(emb):
    out = similarity.cosine_topk_bruteforce(emb.filter("vec_id = 0"), emb, k=3).collect()
    assert len(out) == 3
    assert all(r.neighbor_id != 0 for r in out)


def test_planted_neardup_is_top_neighbor(emb):
    out = similarity.cosine_topk_bruteforce(emb.filter("vec_id = 0"), emb, k=1).first()
    assert out.neighbor_id == 29
    assert out.cos > 0.999


def test_embedding_neardup_pairs_threshold(emb):
    out = similarity.embedding_neardup_pairs(emb, min_cos=0.999).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(0, 29)]


def test_blocked_neardup_pairs_equals_unblocked_within_blocks(spark):
    # two exact clusters, blocked by a label — block join must find both pairs
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "x"),
            (2, [1.0, 0.0], "x"),
            (3, [0.0, 1.0], "y"),
            (4, [0.0, 1.0], "y"),
        ],
        ["vec_id", "embedding", "label"],
    )
    out = similarity.embedding_neardup_pairs(df, min_cos=0.99, block_col="label")
    assert sorted((r.id_a, r.id_b) for r in out.collect()) == [(1, 2), (3, 4)]


def test_lsh_topk_returns_bucket_neighbors_with_exact_cos(emb, vectors):
    out = similarity.cosine_topk_lsh(
        emb.filter("vec_id = 0"), emb, k=3, num_planes=2, dim=8, seed=3
    ).collect()
    assert 1 <= len(out) <= 3
    for r in out:
        assert abs(r.cos - _cos(vectors[0], vectors[r.neighbor_id])) < 1e-9


def test_multiprobe_superset_of_single_probe(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    single = similarity.cosine_topk_lsh(q, emb, k=1000, num_planes=6, dim=64)
    multi = similarity.cosine_topk_lsh(q, emb, k=1000, num_planes=6, dim=64, multiprobe=True)
    s_pairs = {(r.query_id, r.neighbor_id) for r in single.collect()}
    m_pairs = {(r.query_id, r.neighbor_id) for r in multi.collect()}
    # hamming-1 probing can only ADD candidates; with k above corpus size (no
    # truncation), the single-probe result set is contained in the multi-probe one
    assert s_pairs <= m_pairs
    assert len(m_pairs) > len(s_pairs)  # and it actually recovers more


def test_ivf_full_probe_equals_bruteforce(emb):
    """Probing every cell (nprobe = #centroids) makes IVF exact: identical
    (query, neighbor) sets and cosines to the brute-force baseline."""
    q = emb.filter("vec_id < 3")
    cents = emb.filter(F.col("vec_id") % 10 == 0).count()
    ivf = similarity.cosine_topk_ivf(
        q, emb, k=5, centroid_filter=F.col("vec_id") % 10 == 0, nprobe=cents
    ).collect()
    bf = similarity.cosine_topk_bruteforce(q, emb, k=5).collect()
    canon = lambda rows: sorted((r.query_id, r.neighbor_id, round(r.cos, 9)) for r in rows)
    assert canon(ivf) == canon(bf)


def test_ivf_partial_probe_subset_of_bruteforce_candidates(emb):
    """With nprobe=1, every returned neighbor must live in the probed cell —
    i.e. IVF returns a subset of the brute-force candidate space and at most
    k rows per query."""
    out = similarity.cosine_topk_ivf(
        emb.filter("vec_id < 3"), emb, k=5,
        centroid_filter=F.col("vec_id") % 10 == 0, nprobe=1,
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
    for q, ns in per_q.items():
        assert len(ns) <= 5
        assert q not in ns


def test_int8_quant_stats_hand_vector(spark):
    """One 4-dim vector with max|x| = 2.54: scale = 0.02, and every element
    an exact multiple of the scale → (near-)zero reconstruction error."""
    df = spark.createDataFrame(
        [(1, [2.54, -1.28, 0.02, 0.0], 0)], ["vec_id", "embedding", "label"]
    )
    row = similarity.int8_quant_stats(df).first()
    assert row.n_vecs == 1
    assert row.avg_scale == pytest.approx(0.02, abs=1e-9)
    assert row.avg_mae == pytest.approx(0.0, abs=1e-9)


def test_int8_quant_error_bounded_by_half_scale(emb):
    """Reconstruction MAE can never exceed scale/2 (round-to-nearest)."""
    out = similarity.int8_quant_stats(
        emb.withColumn("label", F.col("vec_id") % 2)
    ).collect()
    for r in out:
        assert r.avg_mae <= r.avg_scale / 2 + 1e-12


def test_kmeans_lloyd_separated_clusters(spark):
    # two well-separated blobs in 2-D; k=2 with lowest-id init (one seed in
    # each blob) must recover the blobs exactly after one iteration
    rows = [
        (0, [0.0, 0.0]), (2, [0.2, 0.0]), (4, [0.0, 0.2]),
        (1, [10.0, 10.0]), (3, [10.2, 10.0]), (5, [10.0, 10.2]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r.cid for r in similarity.kmeans_lloyd(df, k=2, iters=1).collect()}
    assert out[0] == out[2] == out[4] == 0
    assert out[1] == out[3] == out[5] == 1


def test_assign_nearest_tie_breaks_lowest_cid(spark):
    df = spark.createDataFrame([(7, [1.0, 0.0])], ["vec_id", "embedding"])
    cents = spark.createDataFrame(
        [(5, [0.0, 0.0]), (3, [2.0, 0.0])], ["cid", "cvec"]
    )
    out = similarity.assign_nearest(df, cents).collect()[0]
    assert out.cid == 3 and abs(out.d2 - 1.0) < 1e-12  # equidistant -> lowest cid


def test_cosine_topk_pandas_bit_identical_to_expression(spark, sf_smoke):
    from tmdb_spark_data_pipeline_spark.sources.io import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    q = emb.filter("vec_id < 5")
    expr = similarity.cosine_topk_bruteforce(q, emb, k=5)
    pand = similarity.cosine_topk_pandas(q, emb, k=5)
    a = sorted((r.query_id, r.neighbor_id, r.cos) for r in expr.collect())
    b = sorted((r.query_id, r.neighbor_id, r.cos) for r in pand.collect())
    # identical neighbor sets; scores agree to within numpy's SIMD
    # partial-sum reordering (a few ulps), far inside the round-5 the
    # declared query reports
    assert [(q, n) for q, n, _ in a] == [(q, n) for q, n, _ in b]
    assert all(abs(x - y) < 1e-12 for (_, _, x), (_, _, y) in zip(a, b))


def test_label_dispersion_grouped_agg_pandas_udf(spark):
    import math

    # label 0: identical vectors -> R = 1; label 1: opposite vectors -> R = 0
    # label 2: orthogonal unit vectors -> ||mean|| = sqrt(2)/2, mean norm 1
    rows = [
        (0, 0, [1.0, 0.0]), (1, 0, [1.0, 0.0]),
        (2, 1, [1.0, 0.0]), (3, 1, [-1.0, 0.0]),
        (4, 2, [1.0, 0.0]), (5, 2, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {r.label: r for r in similarity.label_dispersion(df).collect()}
    assert out[0].dispersion == 1.0 and out[0].n_vectors == 2
    assert out[1].dispersion == 0.0
    assert out[2].dispersion == round(math.sqrt(2) / 2, 6)
