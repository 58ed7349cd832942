"""Mergeable sketch operators that need the Python boundary.

Unlike ``operators/text.py`` (pure Catalyst expressions), the sketches here
run per-Arrow-batch Python — always ``mapInPandas`` (vectorized pandas over
Arrow batches), never row-at-a-time UDFs (§2.10 policy). Each sketch is
*mergeable*: per-batch summaries combine associatively in a normal grouped
aggregate, which is what makes them work on a 1000-executor cluster — the
full data never concentrates anywhere; only the tiny summaries shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def heavy_hitter_candidates(
    df: DataFrame,
    col: str,
    *,
    counters: int = 80,
) -> DataFrame:
    """Misra–Gries-style heavy-hitter candidate set over a value column, in
    one bounded-memory pass.

    Per Arrow batch, emit every value whose batch count *exceeds*
    ``n_batch / (counters + 1)`` — at most ``counters`` values can clear
    that bar (t values each > n/(c+1) sum past n once t reaches c+1), so
    per-batch state is bounded exactly like a Misra–Gries summary with
    ``counters`` slots. The emitted batch counts then merge in an ordinary
    ``groupBy(value).sum()``.

    Recall guarantee (the property a dedup/vocab pipeline actually needs):
    any value with GLOBAL count > N / (counters + 1) appears in the output.
    Pigeonhole: if its count were ≤ n_b/(counters+1) in every batch b, the
    global total would be ≤ Σ n_b/(counters+1) = N/(counters+1). No false
    negatives above the threshold; false positives are pruned by one exact
    recount of the (≤ counters × n_batches)-row candidate set — the same
    two-pass discipline as ``approx_percentile_gate``.

    The merged ``mg_count`` is a lower bound on the true count (only
    above-bar batches contribute) — audit metadata, not a point estimate.

    Scale shape: the corpus pass is map-only (no shuffle); only candidate
    summaries — ~counters rows per batch, ~100 bytes each — reach the
    exchange. NULLs are ignored (not heavy-hitter material).
    """
    if counters < 1:
        raise ValueError(f"counters must be >= 1, got {counters}")
    import pandas as pd  # noqa: F811

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            vals = pdf[col].dropna()
            if vals.empty:
                continue
            vc = vals.value_counts()
            bar = len(vals) / (counters + 1)
            keep = vc[vc > bar]
            if keep.empty:
                continue
            yield pd.DataFrame(
                {"value": keep.index.astype(str), "mg_count": keep.to_numpy()}
            )

    cand = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        op, "value string, mg_count long"
    )
    return cand.groupBy("value").agg(F.sum("mg_count").alias("mg_count"))


def _cm_bucket(row: int, col, width: int):
    """Portable 32-bit bucket hash, bit-identical across engines (the
    md5-prefix discipline of ``sampling.hash_split``): Spark
    ``conv(substr(md5('r:' || x), 1, 8), 16, 10) % width`` ≡ DuckDB
    ``CAST('0x' || substr(md5(...), 1, 8) AS BIGINT) % width``."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}:"), col)), 1, 8), 16, 10)
        .cast("long")
        % width
    )


def cm_sketch(df, col: str, *, width: int = 256, depth: int = 4):
    """COUNT-MIN sketch of a value stream → the (row, bucket, c) counter
    table. One pass: each value fans out to ``depth`` (row, bucket)
    entries (in-row ``explode`` of a literal array — no extra scan), then
    a grouped count. The counter table is MERGEABLE by construction
    (grouped sums commute with partitioning/merging — same contract as
    the MG/HLL/KLL family): shard sketches = shard-local groupBy, global
    sketch = one more grouped sum over depth×width rows. Point estimate
    = min over rows of the value's counter; guaranteed ≥ the true count
    (hash collisions only ever ADD), within εN with high probability for
    width = e/ε. Hashes are portable md5 prefixes, so an external engine
    rebuilds the IDENTICAL table — the property the declared query's
    oracle exploits."""
    entries = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _cm_bucket(r, F.col(col), width).alias("b")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__e")
    ).select("__e.r", "__e.b")
    return entries.groupBy("r", "b").agg(F.count("*").alias("c"))


def cm_estimate(sketch, probes, col: str, *, width: int = 256, depth: int = 4):
    """Point-estimate lookup against a ``cm_sketch`` counter table for a
    (small, broadcastable) probe set: recompute the probe's bucket per
    row, LEFT-join the counters, take the per-probe MIN of
    ``coalesce(c, 0)``. Returns the probe DataFrame with ``cm_estimate``
    appended. The left join + zero floor preserves the sketch's
    point-estimate contract for out-of-stream probes: a value none of
    whose buckets has a counter row estimates 0 (never vanishes from the
    output), and a probe with SOME empty buckets floors its min at 0
    instead of min-ing only over the occupied ones (which would bias the
    estimate upward). For in-stream probes every bucket holds at least
    the probe's own count, so the join behaves exactly as the old inner
    join did."""
    probed = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _cm_bucket(r, F.col(col), width).alias("b")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__e"),
    ).select("*", F.col("__e.r").alias("r"), F.col("__e.b").alias("b")).drop("__e")
    joined = probed.join(sketch, ["r", "b"], "left")
    keys = [c for c in probes.columns]
    return joined.groupBy(*keys).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_estimate")
    )
