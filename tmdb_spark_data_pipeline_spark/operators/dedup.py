"""Deduplication operators (SURVEY.md §2.11 item 13; BASELINE.json north star).

Four tiers, all pure DataFrame expressions (no Python UDFs — every hash is a
JVM built-in inside whole-stage codegen):

- exact:      content hash (``sha2``) → keep deterministic representative
- near-dup:   word n-gram shingles → exact Jaccard on shingle-sharing pairs
- minhash:    MinHash signatures + LSH banding → candidates → exact verify
- simhash:    64-bit rotation-invariant fingerprint, hamming-bucket join

Scale notes (100 TB): the shingle-join (``ngram_jaccard_pairs``) is exact but
its candidate set grows with shingle collisions — fine when shingles are
discriminative (trigrams here), quadratic in the worst case. MinHash+LSH is
the scale path: signature size is constant per doc (128 longs), banding makes
candidate generation O(near-dup pairs), and each stage is a plain shuffle
Catalyst can size with AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ColumnOrName, _col
from .cleaning import dedup_by_key


def content_hash(c: ColumnOrName, bits: int = 256) -> Column:
    """Lowercase-hex content hash; Spark ``sha2`` == DuckDB ``sha256``."""
    return F.sha2(_col(c), bits)


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content hash, keeping the min-id representative.

    groupBy on the hash (one shuffle, map-side partial agg); at 100 TB the
    hash groupBy beats sorting the raw text by orders of magnitude — the
    shuffle carries 32-byte digests, not documents.
    """
    h = content_hash(text_col).alias("__h")
    winners = (
        df.select(h, F.col(id_col))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
    )
    # semi join back to retain full rows of representatives only
    return df.join(winners.select(id_col), id_col, "left_semi")


def word_shingles(text: ColumnOrName, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column.

    ``split`` + self-``zip_with`` trick: shingle i = words[i..i+n-1], built
    with ``transform`` over an index sequence — all Catalyst expressions.
    """
    words = F.split(_col(text), r"\s+")
    k = F.size(words) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return F.when(k > 0, F.array_distinct(shingle)).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact near-dup pairs by n-gram Jaccard, blocked on shared shingles.

    explode(shingles) → self equi-join on shingle → count shared per pair →
    ``|A∩B| / (|A|+|B|-|A∩B|)``. Only pairs sharing ≥1 shingle ever meet,
    so the join *is* the blocking step. Output: (id_a, id_b, jaccard).
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(text_col, n)).alias("__s"),
    )
    sizes = sh.groupBy("__id").agg(F.count("*").alias("__sz"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count("*").alias("__shared"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("__sza"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("__szb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("__shared") / (F.col("__sza") + F.col("__szb") - F.col("__shared")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(shingles: ColumnOrName, num_hashes: int = 128) -> list[Column]:
    """MinHash: for seed i, min over shingles of ``xxhash64(shingle, i)``.

    One array-min per seed — Catalyst expressions only, evaluated in a single
    projection over the shingle array (no shuffle, no UDF).
    """
    arr = _col(shingles)

    def _minhash(seed: int) -> Column:
        # NB: the lambda must stay single-parameter — PySpark treats a second
        # (even defaulted) parameter as the array-index lambda variable.
        return F.array_min(F.transform(arr, lambda s: F.xxhash64(s, F.lit(seed))))

    return [_minhash(i).alias(f"mh_{i}") for i in range(num_hashes)]


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, verified with exact Jaccard.

    rows per band = num_hashes / bands. Detection probability for a pair at
    Jaccard j is ``1 - (1 - j^r)^b``; with (b=32, r=4), j=0.5 → 0.88,
    j=0.8 → ~1.0. Candidates are verified exactly, so false positives cost
    one Jaccard evaluation and never reach the output.

    Pipeline: shingle → 128-col signature → explode to (band_id, band_hash)
    → groupBy bucket → pairs within bucket → distinct → exact verify.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands

    with_sig = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
        word_shingles(text_col, n).alias("__sh"),
    ).select("__id", "__text", *minhash_signature("__sh", num_hashes))

    band_cols = [
        F.struct(
            F.lit(band).alias("band"),
            F.xxhash64(*[F.col(f"mh_{band * r + j}") for j in range(r)]).alias("sig"),
        )
        for band in range(bands)
    ]
    buckets = with_sig.select(
        "__id", F.explode(F.array(*band_cols)).alias("__b")
    ).select("__id", F.col("__b.band").alias("__band"), F.col("__b.sig").alias("__sig"))

    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__sig") == F.col("b.__sig"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )

    sh = df.select(F.col(id_col).alias("__id"), F.explode(word_shingles(text_col, n)).alias("__s"))
    sizes = sh.groupBy("__id").agg(F.count("*").alias("__sz"))
    pair_tok = candidates.join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__s", "__s_a"), "id_a").join(
        sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__s", "__s_b"), "id_b"
    )
    shared = (
        pair_tok.filter(F.col("__s_a") == F.col("__s_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__shared"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("__sza"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("__szb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("__shared") / (F.col("__sza") + F.col("__szb") - F.col("__shared")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text: ColumnOrName, *, use_bits: int = 63) -> Column:
    """SimHash fingerprint over whitespace tokens (rotation-invariant near-dup
    sketch). Per bit b: sign of Σ_tokens (bit_b(xxhash64(token)) ? +1 : -1);
    the fingerprint packs the signs. Pure expressions: one ``transform`` to
    hash tokens, then 63 ``aggregate``-free bit sums via ``filter``+``size``.

    ``use_bits=63`` keeps the result in a signed long without overflow.
    """
    tokens = F.split(_col(text), r"\s+")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    total = F.size(hashes)

    def _ones(bit: int) -> Column:
        # single-parameter lambda only (see minhash_signature note)
        return F.size(F.filter(hashes, lambda h: F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1))

    out = F.lit(0).cast("long")
    for bit in range(use_bits):
        bit_set = (_ones(bit) * 2) > total  # majority of tokens have this bit set
        out = out + F.when(bit_set, F.lit(2**bit).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col), simhash64(text_col).alias("simhash"))
