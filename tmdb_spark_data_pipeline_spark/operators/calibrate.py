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


def ridge_fit_2(
    df: DataFrame,
    group_cols: tuple[str, ...],
    y_col: str,
    x1_col: str,
    x2_col: str,
    *,
    lam: float = 1.0,
) -> DataFrame:
    """Closed-form ridge regression per group, two predictors + intercept —
    "fit a small model in SQL": β = (XᵀX + λI₋)⁻¹ Xᵀy solved analytically
    (Cramer on the symmetric 3×3 normal matrix; λ on the non-intercept
    diagonal only, the standard unpenalized-intercept form).

    Everything the model needs is NINE moment sums per group — n, Σx₁, Σx₂,
    Σx₁², Σx₁x₂, Σx₂², Σy, Σx₁y, Σx₂y — accumulated in ``decimal(30,6)`` so
    the fit is bit-identical regardless of partial-agg order, then a fixed
    sequence of double arithmetic both engines evaluate identically. One
    shuffle carrying 9 numbers per group at ANY data size: the pattern that
    fits millions of per-entity models in a single pass where an ML-library
    loop would fit one at a time.

    λ > 0 also guarantees the system is nonsingular (det > 0 whenever n ≥ 1),
    so degenerate groups (constant predictors) still return coefficients
    instead of NULLs. Output: group cols, ``n``, ``b0``, ``b1``, ``b2``.
    """
    d = lambda c: c.cast("decimal(30,6)")  # noqa: E731
    x1, x2, y = F.col(x1_col), F.col(x2_col), F.col(y_col)
    m = df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum(d(x1)).cast("double").alias("s1"),
        F.sum(d(x2)).cast("double").alias("s2"),
        F.sum(d(x1 * x1)).cast("double").alias("s11"),
        F.sum(d(x1 * x2)).cast("double").alias("s12"),
        F.sum(d(x2 * x2)).cast("double").alias("s22"),
        F.sum(d(y)).cast("double").alias("sy"),
        F.sum(d(x1 * y)).cast("double").alias("s1y"),
        F.sum(d(x2 * y)).cast("double").alias("s2y"),
    )
    a11 = F.col("n").cast("double")
    a12, a13 = F.col("s1"), F.col("s2")
    a22 = F.col("s11") + F.lit(lam)
    a23 = F.col("s12")
    a33 = F.col("s22") + F.lit(lam)
    b1, b2, b3 = F.col("sy"), F.col("s1y"), F.col("s2y")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    det0 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    )
    det1 = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    )
    det2 = (
        a11 * (a22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    )
    return m.select(
        *group_cols,
        "n",
        (det0 / det).alias("b0"),
        (det1 / det).alias("b1"),
        (det2 / det).alias("b2"),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    order_col: str,
    *,
    out_col: str = "normalized",
) -> DataFrame:
    """Quantile normalization across groups: map each group's value
    distribution onto the GLOBAL distribution — row at within-group rank
    i of n_g takes the global value at rank ceil(i·N/n_g). After it, every
    group has (a subsample of) the same distribution, which removes
    per-group scale drift (the microarray-normalization trick, applied to
    per-source quality scores before cross-source threshold filtering).

    Entirely integer rank arithmetic — ceil via ``(i·N + n_g − 1) DIV n_g``
    — so there is no float boundary for engines to disagree on;
    ``order_col`` must make (value, order) a total order per group.

    Shape: one global ranking of the value column (single-partition window
    here — at billions of rows use two-pass range-partitioned ranking),
    one per-group window, and one integer equi-join back to the global
    rank table (shuffles carry (value, rank) pairs only).
    """
    from pyspark.sql import Window

    # ranks carried as LONG end-to-end (ADVICE r5: an int cast capped the
    # computed rank at ~2.1B rows). Note the remaining bound: row_number()
    # itself returns IntegerType, so the single-window global ranking here
    # is valid to 2^31−1 rows — beyond that, swap THIS stage for the
    # two-pass range-partitioned ranking the docstring describes (per-range
    # counts → offset + within-range row_number), which composes in long.
    g = df.select(
        F.col(value_col).alias("__gv"), F.col(order_col).alias("__go")
    ).withColumn(
        "__gi",
        F.row_number().over(
            Window.orderBy(F.col("__gv").asc(), F.col("__go").asc())
        ).cast("long"),
    ).select("__gv", "__gi")
    total = df.agg(F.count("*").cast("long").alias("__n"))
    wg = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(order_col).asc()
    )
    s = (
        df.crossJoin(F.broadcast(total))
        .withColumn("__i", F.row_number().over(wg))
        .withColumn("__ns", F.count("*").over(Window.partitionBy(group_col)))
    )
    # integer ceil-division: exact at any scale (double floor would lose
    # exactness once i*N passes 2^53); DIV yields long — keep it long
    s = s.withColumn("__gi", F.expr("(__i * __n + __ns - 1) DIV __ns").cast("long"))
    s = s.drop("__n")
    return (
        s.join(g, "__gi")
        .withColumn(out_col, F.col("__gv"))
        .drop("__i", "__ns", "__gi", "__gv")
    )
