"""The reference's end-to-end movie pipeline, composed from engine operators.

A user of `Zaina-M/tmdb-spark-data-pipeline` runs: Bronze (nested TMDB JSON)
→ Silver (flat, typed, deduped) → Gold (KPI rankings, searches, group-bys).
This module reproduces that surface 1:1 on the operator library:

- ``curate``      ≙ ``transform/clean_transform.py:67-173`` (transform_bronze)
- ``prepare_kpis``≙ ``analytics/kpis.py:54-62``
- ``movie_kpis``  ≙ ``analytics/kpis.py:79-96`` (the 10 ranking KPIs)
- ``search_*``    ≙ ``analytics/kpis.py:99-122``
- ``franchise_vs_standalone`` / ``top_franchises`` / ``top_directors``
                  ≙ ``analytics/kpis.py:125-180``

Documented deviations (SURVEY.md §7): arrays stay ``array<string>`` in Silver
(pipe-joining is presentation-only via ``flatten.to_pipe_string``); rankings
pin ``nulls_last`` + an ``id`` tie-breaker; division is ``try_divide``;
dedup keeps the deterministic min-id row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import cleaning, flatten, metrics, rank, search

#: clean_transform.py:76-77 / config.yaml:68-74
DEFAULT_DROP = ("adult", "imdb_id", "original_title", "video", "homepage", "status")

#: schemas.py:176-184 (with the vote_count int pin, SURVEY §1.3)
NUMERIC_CASTS = {
    "budget": "double",
    "revenue": "double",
    "popularity": "double",
    "vote_average": "double",
    "vote_count": "int",
    "runtime": "int",
    "id": "int",
}

#: config/config.yaml:62-80
MIN_BUDGET_FOR_ROI = 10.0
MIN_VOTES_FOR_RATING = 1
DEFAULT_TOP_N = 5


def curate(bronze: DataFrame, *, min_non_null: int = 10) -> DataFrame:
    """Bronze → Silver (``transform_bronze``, ``clean_transform.py:67-173``).

    Order of operations mirrors the reference: status filter → drops →
    flatten nested structures → casts → null normalization → dedup/dropna/
    completeness. Output keeps arrays as arrays (deviation, SURVEY §1.4).
    """
    df = cleaning.filter_equals(bronze, "status", "Released")
    df = cleaning.drop_columns(df, DEFAULT_DROP)

    cols = ["*"]
    if "belongs_to_collection" in df.columns:
        cols.append(F.col("belongs_to_collection.name").alias("collection_name"))
    if "genres" in df.columns:
        cols.append(flatten.names_of("genres").alias("genre_names"))
    if "credits" in df.columns:
        directors = flatten.names_of(flatten.where_field_equals("credits.crew", "job", "Director"))
        cols += [
            flatten.names_of("credits.cast").alias("cast_names"),
            flatten.array_size("credits.cast").alias("cast_size"),
            flatten.first_element(directors).alias("director"),
            flatten.array_size("credits.crew").alias("crew_size"),
        ]
    df = df.select(*cols)
    df = cleaning.drop_columns(df, ("belongs_to_collection", "genres", "credits"))
    df = df.withColumnsRenamed({"genre_names": "genres", "cast_names": "cast"})

    df = cleaning.cast_columns(df, NUMERIC_CASTS)
    if "release_date" in df.columns:
        df = df.withColumn("release_date", F.to_date("release_date"))

    df = cleaning.null_non_positive(df, ("budget", "revenue", "runtime"))
    if {"vote_average", "vote_count"} <= set(df.columns):
        df = cleaning.null_when_unsupported(df, "vote_average", "vote_count", MIN_VOTES_FOR_RATING)
    df = cleaning.replace_sentinels(df, ("overview", "tagline"))

    for src, dst in (("budget", "budget_musd"), ("revenue", "revenue_musd")):
        if src in df.columns:
            df = df.withColumn(dst, metrics.to_millions(src)).drop(src)

    # deterministic winner among duplicate ids (reference dropDuplicates
    # keeps an arbitrary row, SURVEY §7): first by title then vote_count
    df = cleaning.dedup_by_key(df, ("id",), tiebreak=(F.col("title"), F.col("vote_count")))
    df = cleaning.dropna_required(df, ("id", "title"))
    return cleaning.completeness_filter(df, min_non_null)


def prepare_kpis(silver: DataFrame) -> DataFrame:
    """profit/ROI derivation (``kpis.py:54-62``): ROI only where budget ≥ 10
    (``config.yaml:63``), NULL otherwise — via try_divide, ANSI-safe."""
    df = metrics.with_profit(silver, "revenue_musd", "budget_musd", alias="profit_musd")
    return metrics.with_ratio(df, "revenue_musd", "budget_musd", alias="roi", min_den=MIN_BUDGET_FOR_ROI)


def rank_movies(
    df: DataFrame,
    metric: str,
    *,
    order: str = "desc",
    top_n: int = DEFAULT_TOP_N,
    filter_expr: Column | None = None,
) -> DataFrame:
    """``rank_movies`` (``kpis.py:65-76``) with deterministic ordering."""
    return rank.top_k(
        prepare_kpis(df), metric, order=order, k=top_n, tiebreak=("id",), filter_expr=filter_expr
    )


#: The 10 ranking KPIs (``kpis.py:80-91``; names from ``config.yaml:83-93``).
KPI_SPECS: dict[str, dict] = {
    "highest_revenue": {"metric": "revenue_musd", "order": "desc"},
    "highest_budget": {"metric": "budget_musd", "order": "desc"},
    "highest_profit": {"metric": "profit_musd", "order": "desc"},
    "lowest_profit": {"metric": "profit_musd", "order": "asc"},
    "highest_roi": {"metric": "roi", "order": "desc", "min_budget": MIN_BUDGET_FOR_ROI},
    "lowest_roi": {"metric": "roi", "order": "asc", "min_budget": MIN_BUDGET_FOR_ROI},
    "most_voted": {"metric": "vote_count", "order": "desc"},
    "highest_rated": {"metric": "vote_average", "order": "desc", "min_votes": 10},
    "lowest_rated": {"metric": "vote_average", "order": "asc", "min_votes": 10},
    "most_popular": {"metric": "popularity", "order": "desc"},
}


def movie_kpis(silver: DataFrame, top_n: int = DEFAULT_TOP_N) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name, spec in KPI_SPECS.items():
        fe = None
        if "min_budget" in spec:
            fe = F.col("budget_musd") >= spec["min_budget"]
        if "min_votes" in spec:
            fe = F.col("vote_count") >= spec["min_votes"]
        out[name] = rank_movies(
            silver, spec["metric"], order=spec["order"], top_n=top_n, filter_expr=fe
        )
    return out


def search_genre_cast(
    silver: DataFrame, *, genres: tuple[str, ...], cast: tuple[str, ...], min_votes: int = 10
) -> DataFrame:
    """``run_search_queries`` #1 (``kpis.py:102-110``) with exact array
    membership instead of the substring false-positive (F12)."""
    preds = [search.array_has("genres", g) for g in genres]
    preds += [search.array_has("cast", c) for c in cast]
    preds.append(search.threshold("vote_count", ">=", min_votes))
    return search.search(
        silver, search.all_of(*preds), order_by=[F.col("vote_average").desc_nulls_last(), F.col("id").asc()]
    )


def search_cast_director(silver: DataFrame, *, actor: str, director: str) -> DataFrame:
    """``run_search_queries`` #2 (``kpis.py:113-119``)."""
    pred = search.all_of(search.array_has("cast", actor), F.col("director") == director)
    return search.search(silver, pred, order_by=[F.col("runtime").asc_nulls_last(), F.col("id").asc()])


def franchise_vs_standalone(silver: DataFrame) -> DataFrame:
    """``kpis.py:125-142``: when/otherwise grouping key + multi-aggregate
    (exact median instead of percentile_approx, SURVEY §7)."""
    df = prepare_kpis(silver)
    flag = F.when(F.col("collection_name").isNotNull(), "Franchise").otherwise("Standalone")
    return (
        df.withColumn("kind", flag)
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_movies"),
            F.round(F.avg("revenue_musd"), 2).alias("mean_revenue"),
            F.round(F.median("roi"), 2).alias("median_roi"),
            F.round(F.avg("budget_musd"), 2).alias("mean_budget"),
            F.round(F.avg("popularity"), 2).alias("mean_popularity"),
            F.round(F.avg("vote_average"), 2).alias("mean_rating"),
        )
    )


def top_franchises(silver: DataFrame, top_n: int = DEFAULT_TOP_N) -> DataFrame:
    """``kpis.py:145-163``."""
    return rank.top_k(
        silver.filter(F.col("collection_name").isNotNull())
        .groupBy("collection_name")
        .agg(
            F.count("*").alias("n_movies"),
            F.round(F.sum("budget_musd"), 2).alias("total_budget"),
            F.round(F.avg("budget_musd"), 2).alias("mean_budget"),
            F.round(F.sum("revenue_musd"), 2).alias("total_revenue"),
            F.round(F.avg("revenue_musd"), 2).alias("mean_revenue"),
            F.round(F.avg("vote_average"), 2).alias("mean_rating"),
        ),
        "total_revenue",
        order="desc",
        k=top_n,
        tiebreak=("collection_name",),
    )


def top_directors(silver: DataFrame, top_n: int = DEFAULT_TOP_N) -> DataFrame:
    """``kpis.py:166-180``. Unlike the reference, the null-director group is
    excluded (documented deviation — a 'no director' aggregate row is noise)."""
    return rank.top_k(
        silver.filter(F.col("director").isNotNull())
        .groupBy("director")
        .agg(
            F.count("*").alias("n_movies"),
            F.round(F.sum("revenue_musd"), 2).alias("total_revenue"),
            F.round(F.avg("vote_average"), 2).alias("mean_rating"),
        ),
        "total_revenue",
        order="desc",
        k=top_n,
        tiebreak=("director",),
    )
