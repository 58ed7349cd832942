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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ColumnOrName, _col


def zorder_key(a: ColumnOrName, b: ColumnOrName, *, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    expressions: bit i of ``a`` lands at position 2i, bit i of ``b`` at
    2i+1. Callers bucket/clamp wider domains first (e.g. ``pmod(col, 2^16)``
    or a rank/percentile bucket) — interleaving beyond ~20 bits per column
    adds no pruning power, the curve's locality lives in the high bits.

    Pure integer expressions (shift/and/or) — whole-stage codegen, exactly
    reproducible in any engine with the same bit operators.
    """
    av, bv = _col(a).cast("long"), _col(b).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(av, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(bv, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


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
