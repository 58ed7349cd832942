"""Runnable pipeline entry point: ingest → curate → kpis → viz-data.

The reference ships four ``spark-submit`` mains sequenced by docker-compose
(``docker/docker-compose.yml:17-79``: ingest, transform, kpi, visualization),
each gated by the ``.done``-marker protocol. This CLI runs the same four
stages in one process (or any subset), against either a REST source stub fed
with fixture payloads (default — no network in this environment) or a
caller-provided bronze directory.

    python -m tmdb_spark_data_pipeline_spark --data-dir /tmp/movie_data
    python -m tmdb_spark_data_pipeline_spark --data-dir /tmp/movie_data \
        --stage curate --date 2026-08-13

Layout under ``--data-dir`` (mirroring the reference's ``data/`` volume):
``bronze/``, ``quarantine/``, ``silver/``, ``gold/<kpi>/``, ``viz/<chart>/``,
with ``.done/`` marker dirs per stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import date as _date

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import schemas
from .pipelines import movies, viz
from .pipelines.config import DEFAULT_CONFIG, MoviePipelineConfig, load_config
from .session import get_spark
from .sources import io as sio
from .sources import rest

STAGES = ("ingest", "curate", "kpis", "viz")


def _fixture_payloads() -> dict[str, dict]:
    """Deterministic stand-in for the TMDB API (no network in this
    environment): a handful of fully-populated Bronze payloads plus one
    invalid record that must land in quarantine."""

    def movie(mid: int, title: str, **over) -> dict:
        base = {
            "id": mid,
            "title": title,
            "overview": f"Plot of {title}",
            "tagline": "tag",
            "release_date": f"20{10 + mid % 10}-03-0{1 + mid % 9}",
            "budget": 40_000_000 + mid * 1_000_000,
            "revenue": 90_000_000 + mid * 5_000_000,
            "runtime": 95 + mid,
            "vote_average": 5.0 + (mid % 5),
            "vote_count": 100 * (mid + 1),
            "popularity": 10.0 * (mid + 1),
            "original_language": "en",
            "status": "Released",
            "genres": [{"id": 28, "name": "Action"}, {"id": 12, "name": "Adventure"}],
            "belongs_to_collection": (
                {"id": 900, "name": "Fixture Saga", "poster_path": None, "backdrop_path": None}
                if mid % 2 == 0
                else None
            ),
            "production_companies": [
                {"id": 5, "logo_path": None, "name": "Fixture Films", "origin_country": "US"}
            ],
            "production_countries": [{"iso_3166_1": "US", "name": "United States"}],
            "spoken_languages": [{"iso_639_1": "en", "name": "English"}],
            "poster_path": f"/poster_{mid}.png",
            "backdrop_path": None,
            "credits": {
                "cast": [
                    {"id": 1, "name": "A Star", "character": "Hero", "order": 0},
                    {"id": 2, "name": "B Star", "character": "Lead", "order": 1},
                ],
                "crew": [
                    {"id": 3, "name": f"Director {mid % 3}", "job": "Director", "department": "Directing"},
                    {"id": 4, "name": "Producer P", "job": "Producer", "department": "Production"},
                ],
            },
        }
        base.update(over)
        return base

    payloads = {str(i): movie(i, f"Fixture Movie {i}") for i in range(8)}
    payloads["3"] = movie(3, "Fixture Movie 3", status="Post Production")
    payloads["bad"] = {"success": False, "status_code": 34, "status_message": "not found"}
    return payloads


def stage_ingest(
    spark: SparkSession,
    data_dir: str,
    run_date: str,
    config: MoviePipelineConfig = DEFAULT_CONFIG,
) -> None:
    """REST-stub fetch → validate → quarantine split → Bronze parquet
    (≙ ``ingestion/fetch_movies.py`` main).

    The fetch result is persisted once: every downstream action (quarantine
    write, bronze write, metrics) would otherwise re-trigger the REST fan-out
    — re-fetching an external API per Spark action is the one recomputation
    Spark's lazy model makes easy to ship by accident. Row counts come from
    a single ``Observation`` on the quarantine write (no extra count scans),
    and the reference's declared-but-unenforced ``max_rejection_rate``
    (config.yaml:96-99) ABORTS the stage before the done-marker commits.
    """
    from pyspark.sql import Observation

    base = f"{data_dir}/bronze"
    if not sio.find_unprocessed(base, [run_date]):
        print(f"ingest: {run_date} already done, skipping")
        return
    payloads = _fixture_payloads()

    def fetch(key: str):
        p = payloads.get(key)
        if p is None:
            return 404, {}, None
        return 200, {}, p

    results = rest.fetch_distributed(
        spark, sorted(payloads), fetch, num_partitions=4
    ).withColumn(
        "success",
        F.col("success")
        & F.get_json_object("payload_json", "$.id").isNotNull()
        & F.get_json_object("payload_json", "$.title").isNotNull(),
    ).persist()
    obs = Observation()
    observed = results.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("success"), 0).otherwise(1)).alias("n_rejected"),
    )
    try:
        # Quarantine goes to a STAGING path first: the rejection-rate check
        # below may abort the stage, and an abort must not have destroyed the
        # previous run's quarantine output (the observe-action needs a write
        # to fire, so the write cannot simply move after the check).
        quarantine_dir = f"{data_dir}/quarantine"
        staging = f"{quarantine_dir}__staging"
        sio.write_json(observed.filter(~F.col("success")), staging, mode="overwrite")
        n_total, n_rejected = obs.get["n_total"], obs.get["n_rejected"]
        rate = (n_rejected or 0) / n_total if n_total else 0.0
        if rate > config.max_rejection_rate:
            raise RuntimeError(
                f"ingest aborted: rejection rate {rate:.2f} exceeds "
                f"max_rejection_rate {config.max_rejection_rate} "
                f"({n_rejected}/{n_total} rejected); bronze NOT written, no done-marker"
            )
        import shutil

        shutil.rmtree(quarantine_dir, ignore_errors=True)
        os.rename(staging, quarantine_dir)
        bronze = results.filter(F.col("success")).select(
            F.from_json("payload_json", schemas.BRONZE_SCHEMA).alias("m")
        ).select("m.*")
        schemas.validate(bronze, schemas.BRONZE_SCHEMA, layer="bronze")
        bronze = sio.stamp_audit_columns(bronze, run_id=f"run-{run_date}", ingestion_date=run_date)
        sio.write_parquet(bronze, base, mode="overwrite", partition_by=("ingestion_date",))
        sio.mark_done(base, run_date)
    finally:
        # the abort path must release the cached fetch result too
        results.unpersist()
    print(f"ingest: wrote {n_total - (n_rejected or 0)} bronze rows, {n_rejected} quarantined")


def stage_curate(
    spark: SparkSession, data_dir: str, run_date: str, config: MoviePipelineConfig
) -> None:
    """Bronze → Silver (≙ ``transform/clean_transform.py`` main)."""
    base = f"{data_dir}/silver"
    if not sio.find_unprocessed(base, [run_date]):
        print(f"curate: {run_date} already done, skipping")
        return
    bronze = sio.read_parquet(spark, f"{data_dir}/bronze").drop(
        "ingestion_timestamp", "run_id", "ingestion_date"
    )
    silver = movies.curate(bronze, config=config)
    sio.write_parquet(silver, base, mode="overwrite")
    sio.mark_done(base, run_date)
    print(f"curate: wrote {silver.count()} silver rows")


def stage_kpis(
    spark: SparkSession, data_dir: str, run_date: str, config: MoviePipelineConfig
) -> None:
    """Silver → Gold KPI tables (≙ ``analytics/kpis.py`` main)."""
    base = f"{data_dir}/gold"
    if not sio.find_unprocessed(base, [run_date]):
        print(f"kpis: {run_date} already done, skipping")
        return
    silver = sio.read_parquet(spark, f"{data_dir}/silver")
    outputs: dict[str, int] = {}
    for name, df in movies.movie_kpis(silver, config=config).items():
        sio.write_parquet(df, f"{base}/{name}", mode="overwrite")
        outputs[name] = df.count()
    for name, df in (
        ("franchise_vs_standalone", movies.franchise_vs_standalone(silver, config=config)),
        ("top_franchises", movies.top_franchises(silver, config=config)),
        ("top_directors", movies.top_directors(silver, config=config)),
    ):
        sio.write_parquet(df, f"{base}/{name}", mode="overwrite")
        outputs[name] = df.count()
    sio.mark_done(base, run_date)
    print(f"kpis: wrote {len(outputs)} gold tables: {json.dumps(outputs)}")


def stage_viz(spark: SparkSession, data_dir: str, run_date: str) -> None:
    """Silver → chart-ready data tables (≙ ``visualization/visualize.py``;
    PNG rendering itself is stubbed — no matplotlib in this environment)."""
    base = f"{data_dir}/viz"
    if not sio.find_unprocessed(base, [run_date]):
        print(f"viz: {run_date} already done, skipping")
        return
    silver = sio.read_parquet(spark, f"{data_dir}/silver")
    for name, df in (
        ("genre_roi", viz.genre_roi_data(silver)),
        ("yearly_revenue", viz.yearly_revenue_data(silver)),
        ("popularity_vs_rating", viz.popularity_vs_rating_data(silver)),
    ):
        sio.write_parquet(df, f"{base}/{name}", mode="overwrite")
    sio.mark_done(base, run_date)
    print("viz: wrote 3 chart-data tables")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tmdb_spark_data_pipeline_spark")
    ap.add_argument("--data-dir", required=True, help="pipeline data root")
    ap.add_argument("--stage", choices=(*STAGES, "all"), default="all")
    ap.add_argument("--date", default=_date.today().isoformat(), help="run date (marker unit)")
    ap.add_argument("--config", default=None, help="YAML/JSON config overrides")
    args = ap.parse_args(argv)

    config = load_config(args.config) if args.config else DEFAULT_CONFIG
    spark = get_spark(app_name="movie-pipeline")
    stages = STAGES if args.stage == "all" else (args.stage,)
    for s in stages:
        if s == "ingest":
            stage_ingest(spark, args.data_dir, args.date, config)
        elif s == "curate":
            stage_curate(spark, args.data_dir, args.date, config)
        elif s == "kpis":
            stage_kpis(spark, args.data_dir, args.date, config)
        elif s == "viz":
            stage_viz(spark, args.data_dir, args.date)
    return 0


if __name__ == "__main__":
    sys.exit(main())
