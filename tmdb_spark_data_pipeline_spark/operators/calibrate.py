"""Isotonic calibration: per-group monotone regression via PAVA.

The one genuinely SEQUENTIAL algorithm in the operator library — pool
adjacent violators until the fitted curve is monotone — and therefore the
showcase for the ``applyInPandas`` tier of the UDF policy (SURVEY.md §2.10):
each group's bins must be processed in order with data-dependent merges, a
shape no window function or aggregate expresses. Everything around the
Python core stays Spark-side: binning, counting, and the groupBy shuffle
carry only (group, bin, counts) — the Arrow batch entering Python is
bins-per-group rows, never documents.

Determinism contract: the pooled averages are ratios of INTEGER sums
(``hits/total``), violation checks compare fractions by integer
cross-multiplication, and each emitted fit is a single ``int/int`` double
division — bit-identical to any engine computing the same ratio, so the
DuckDB oracle can replay the fit exactly through the minimax identity
``fit_i = max_{j<=i} min_{k>=i} avg(y[j..k])`` (Robertson et al., *Order
Restricted Statistical Inference*; the identity is what makes an
iterative-looking algorithm SQL-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    order_col: str,
    hits_col: str,
    total_col: str,
) -> DataFrame:
    """Per-group isotonic (non-decreasing) fit of the rate ``hits/total``
    over ``order_col`` via pool-adjacent-violators. Input: one row per
    (group, bin) with integer ``hits``/``total``. Output adds ``y_raw``
    (the bin's own rate) and ``y_fit`` (the pooled monotone rate); both are
    single exact-integer divisions.

    PAVA is O(bins) per group with the classic stack formulation; groups
    are independent (one shuffle on ``group_col``), so the operator scales
    with the number of groups, not rows — the corpus-sized work happened
    upstream in the binning aggregation.
    """
    out_schema = StructType(
        [
            StructField(group_col, StringType()),
            StructField(order_col, LongType()),
            StructField(total_col, LongType()),
            StructField(hits_col, LongType()),
            StructField("y_raw", DoubleType()),
            StructField("y_fit", DoubleType()),
        ]
    )

    def _pava(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col)
        hs = [int(v) for v in pdf[hits_col]]
        ns = [int(v) for v in pdf[total_col]]
        # stack of pooled blocks [hits, total, n_bins]; a violation is
        # prev_rate > cur_rate, tested exactly by cross-multiplication
        blocks: list[list[int]] = []
        for h, n in zip(hs, ns):
            blocks.append([h, n, 1])
            while (
                len(blocks) > 1
                and blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
            ):
                h2, n2, c2 = blocks.pop()
                blocks[-1][0] += h2
                blocks[-1][1] += n2
                blocks[-1][2] += c2
        fits: list[float] = []
        for bh, bn, bc in blocks:
            fits.extend([bh / bn] * bc)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].to_numpy(),
                order_col: pdf[order_col].astype("int64").to_numpy(),
                total_col: ns,
                hits_col: hs,
                "y_raw": [h / n for h, n in zip(hs, ns)],
                "y_fit": fits,
            }
        )

    return (
        df.select(group_col, order_col, total_col, hits_col)
        .groupBy(group_col)
        .applyInPandas(_pava, out_schema)
    )
