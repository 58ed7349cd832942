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
    multi-column skipping). The rewrite is staged to a sibling temp dir and
    atomically swapped via rename, so a concurrent reader sees old or new
    files, never a mix.
    """
    import math
    import os
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fn))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__compact_old"
    os.rename(path.rstrip("/"), old)
    os.rename(tmp, path.rstrip("/"))
    shutil.rmtree(old)
    return n_files


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    *,
    bits: int = 16,
    modulus: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of two columns.

    ``repartitionByRange`` on the z-key range-partitions the sort (each task
    sorts its slice — the scalable distributed sort), and the within-partition
    ``sortWithinPartitions`` tightens row-group min/max bounds for BOTH
    underlying columns. ``modulus`` buckets wide key domains into the
    interleaved bit budget.
    """
    m = modulus if modulus is not None else (1 << bits)
    a = F.pmod(F.col(cols[0]), F.lit(m))
    b = F.pmod(F.col(cols[1]), F.lit(m))
    keyed = df.withColumn("__z", zorder_key(a, b, bits=bits))
    (
        keyed.repartitionByRange("__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
