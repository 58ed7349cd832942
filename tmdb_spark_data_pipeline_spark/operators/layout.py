"""Data-layout operators: Z-order (Morton) clustering keys for multi-column
data skipping.

Parquet prunes row groups on per-column min/max stats, which only helps when
the file is SORTED so ranges are tight. A single-column sort gives perfect
skipping on that column and none on others; interleaving the bits of two (or
more) key columns — the Z-order / Morton curve — gives each column roughly
half its bits of locality, so selective predicates on EITHER column prune.
This is the standard lakehouse `OPTIMIZE ZORDER BY` layout, expressed here as
plain Catalyst bit arithmetic plus a sort-before-write: no engine extension
needed, and the written files are ordinary parquet.

Scale posture: the z-key is a per-row projection (codegen); the layout write
is one range-partitioned sort — the same shuffle a plain sort-by-column
write costs. The benefit is read-side: row-group pruning on every interleaved
dimension, forever after.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ColumnOrName, _col


def zorder_key_n(cols: Sequence[ColumnOrName], *, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of N non-negative integer
    expressions: bit i of column j lands at position ``i*N + j``. Callers
    bucket/clamp wider domains first (e.g. ``pmod(col, 2^16)`` or a
    rank/percentile bucket) — interleaving beyond ~20 bits per column adds
    no pruning power, the curve's locality lives in the high bits.
    ``N × bits`` must fit a signed long (≤ 62).

    Pure integer expressions (shift/and/or) — whole-stage codegen, exactly
    reproducible in any engine with the same bit operators.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least two columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits overflows a signed long")
    vals = [_col(c).cast("long") for c in cols]
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, v in enumerate(vals):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return out


def zorder_key(a: ColumnOrName, b: ColumnOrName, *, bits: int = 16) -> Column:
    """Two-column Morton key: bit i of ``a`` → position 2i, of ``b`` → 2i+1
    (the ``zorder_key_n`` layout at N=2)."""
    return zorder_key_n([a, b], bits=bits)


def compact_parquet_dir(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: Sequence[str] = (),
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files (the lakehouse OPTIMIZE /
    maintenance pass). Streaming sinks and per-batch appends accumulate
    kilobyte files; at cluster scale the scan's task-scheduling and footer
    overhead then dominates the read. Returns the new file count.

    Sizing reads the FILESYSTEM byte total (compressed), not Spark's
    in-memory estimate, so the output honors the on-disk target.
    ``sort_within_by`` optionally re-sorts rows within each output file to
    restore min/max pruning tightness (compose with a z-order key for
    multi-column skipping).

    Swap semantics (POSIX rename, no indirection layer): the rewrite stages
    to a sibling temp dir, then swaps with two renames — ``path`` →
    ``path__compact_old`` → new data at ``path``. A reader never sees a MIX
    of old and new files, but between the two renames ``path`` briefly does
    not exist (a reader in that window fails and retries); true
    single-rename atomicity needs a symlink or manifest indirection, which
    ordinary parquet paths don't have. Crash-safe: a leftover
    ``__compact_old`` (crash between the renames or before cleanup) is
    detected on the next run — restored if ``path`` is missing, discarded if
    ``path`` exists — so no state is stranded.
    """
    import math
    import os
    import shutil

    base = path.rstrip("/")
    tmp = base + "__compact_tmp"
    old = base + "__compact_old"
    # recover from a prior crash: data stranded at __compact_old moves back;
    # a stale __compact_old next to a live path is post-swap residue
    if os.path.isdir(old):
        if not os.path.isdir(base):
            os.rename(old, base)
        else:
            shutil.rmtree(old)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)

    total = 0
    for root, _dirs, files in os.walk(base):
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fn))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(base)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(tmp)
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old)
    return n_files


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    *,
    bits: int = 16,
    modulus: int | None = None,
    domain_max: tuple[int, int] | None = None,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of two columns.

    ``repartitionByRange`` on the z-key range-partitions the sort (each task
    sorts its slice — the scalable distributed sort), and the within-partition
    ``sortWithinPartitions`` tightens row-group min/max bounds for BOTH
    underlying columns.

    Wide domains are reduced into the ``bits`` budget by RIGHT-SHIFT (keep
    the HIGH bits): order-preserving, so min/max row-group pruning on the
    raw columns survives — the curve's locality lives in the high bits
    (``zorder_key_n`` docstring). The shift is sized from ``domain_max``
    (per-column non-negative maxima) or, when omitted, from one cheap
    max-aggregate over the input (a driver-side scalar; at scale pass
    ``domain_max`` from table stats instead). ``modulus`` (pmod — keeps the
    LOW bits) remains for layouts queried ONLY by equality: it spreads
    hash-like, and values ``m-1``/``m`` land at opposite curve ends, so
    range pruning on the raw column is lost.
    """
    if modulus is not None:
        a: Column = F.pmod(F.col(cols[0]), F.lit(modulus))
        b: Column = F.pmod(F.col(cols[1]), F.lit(modulus))
    else:
        if domain_max is None:
            row = df.agg(
                F.max(F.col(cols[0]).cast("long")).alias("a"),
                F.max(F.col(cols[1]).cast("long")).alias("b"),
            ).first()
            domain_max = (row.a or 0, row.b or 0)
        shifts = [max(0, int(m).bit_length() - bits) for m in domain_max]
        a = F.shiftright(F.col(cols[0]).cast("long"), shifts[0])
        b = F.shiftright(F.col(cols[1]).cast("long"), shifts[1])
    keyed = df.withColumn("__z", zorder_key(a, b, bits=bits))
    # num_files pins the output file count (e.g. from a compaction target);
    # default lets AQE size the range partitions from the data
    ranged = (
        keyed.repartitionByRange(num_files, "__z")
        if num_files is not None
        else keyed.repartitionByRange("__z")
    )
    (
        ranged.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
