"""Visualization stage (reference ``visualization/visualize.py``).

The reference's charts each reduce to: small aggregate DataFrame →
``toPandas()`` → matplotlib PNG. The ANALYTICS half is fully Spark here —
including genre ROI, which the reference computes by re-splitting pipe
strings in pandas (``visualize.py:76-95``, the A6 anti-pattern SURVEY.md
§2.4 calls out); this module keeps explode/aggregate distributed and crosses
to pandas only with the final plot-sized table (S13).

Rendering is gated behind an import-try: matplotlib is not in this
container (STUB, like the multimodal codecs). ``render_png`` raises
``NotImplementedError`` without it; the chart-data functions are fully
functional and tested either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import metrics
from ..sources.io import to_pandas


def genre_roi_data(silver: DataFrame) -> DataFrame:
    """Mean ROI per genre (``visualize.py:76-95``) — explode + aggregate in
    Spark, not pandas."""
    df = metrics.with_ratio(silver, "revenue_musd", "budget_musd", alias="roi", min_den=10.0)
    return (
        df.select(F.explode("genres").alias("genre"), "roi")
        .filter(F.col("roi").isNotNull())
        .groupBy("genre")
        .agg(F.round(F.avg("roi"), 2).alias("mean_roi"), F.count("*").alias("n_movies"))
        .orderBy(F.col("mean_roi").desc_nulls_last(), F.col("genre").asc())
    )


def yearly_revenue_data(silver: DataFrame) -> DataFrame:
    """Mean revenue per release year (``visualize.py:114-120``)."""
    return (
        silver.filter(F.col("release_date").isNotNull())
        .withColumn("year", F.year("release_date"))
        .groupBy("year")
        .agg(F.round(F.avg("revenue_musd"), 2).alias("mean_revenue"))
        .orderBy("year")
    )


def popularity_vs_rating_data(silver: DataFrame, sample_n: int = 1000) -> DataFrame:
    """Scatter input (``visualize.py:99``): deterministic top-N by popularity
    instead of collecting the full table."""
    from ..operators import rank

    return rank.top_k(
        silver.select("id", "popularity", "vote_average"),
        "popularity",
        order="desc",
        k=sample_n,
        tiebreak=("id",),
    )


def render_png(chart_df: DataFrame, path: str, *, kind: str = "bar", x: str | None = None, y: str | None = None) -> None:
    """Presentation edge: plot-sized DataFrame → PNG via pandas/matplotlib.

    STUB when matplotlib is absent (not installed in this container) — the
    pandas conversion (S13) still runs, so the data path is exercised.
    """
    pdf = to_pandas(chart_df)
    try:
        import matplotlib  # noqa: F401
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - matplotlib not in container
        raise NotImplementedError("matplotlib is not available in this environment") from e
    cols = list(pdf.columns)
    ax = pdf.plot(kind=kind, x=x or cols[0], y=y or cols[1])  # pragma: no cover
    ax.get_figure().savefig(path)  # pragma: no cover
