"""End-to-end movie pipeline tests — the reference's own test cases
(``tests/test_transform.py``, ``tests/test_kpis.py``) against the engine's
``pipelines/movies``. Fixtures follow FIXTURES.md §1/§2."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from tmdb_spark_data_pipeline_spark import schemas
from tmdb_spark_data_pipeline_spark.operators import flatten
from tmdb_spark_data_pipeline_spark.pipelines import movies


def _bronze_row(
    id=1,
    title="Movie",
    status="Released",
    budget=100_000_000,
    revenue=500_000_000,
    vote_average=8.0,
    vote_count=1000,
    popularity=50.0,
    runtime=120,
    release_date="2020-01-15",
    original_language="en",
    overview="plot",
    tagline="tag",
    genres=({"id": 28, "name": "Action"}, {"id": 12, "name": "Adventure"}),
    collection=None,
    companies=({"id": 5, "logo_path": None, "name": "WB", "origin_country": "US"},),
    countries=({"iso_3166_1": "US", "name": "United States"},),
    languages=({"iso_639_1": "en", "name": "English"},),
    cast=(
        {"id": 1, "name": "Bruce Willis", "character": "Hero", "order": 0},
        {"id": 2, "name": "Uma Thurman", "character": "Lead", "order": 1},
    ),
    crew=(
        {"id": 3, "name": "Dana", "job": "Director", "department": "Directing"},
        {"id": 4, "name": "Eli", "job": "Producer", "department": "Production"},
    ),
):
    # full BRONZE_SCHEMA rows (dicts map by name against the declared schema)
    return {
        "id": id,
        "title": title,
        "overview": overview,
        "tagline": tagline,
        "release_date": release_date,
        "budget": budget,
        "revenue": revenue,
        "runtime": runtime,
        "vote_average": vote_average,
        "vote_count": vote_count,
        "popularity": popularity,
        "original_language": original_language,
        "status": status,
        "genres": list(genres),
        "belongs_to_collection": collection,
        "production_companies": list(companies),
        "production_countries": list(countries),
        "spoken_languages": list(languages),
        "poster_path": "/poster.png",
        "backdrop_path": None,
        "credits": {"cast": list(cast), "crew": list(crew)},
    }


@pytest.fixture(scope="module")
def bronze(spark):
    rows = [
        _bronze_row(id=1, title="Released Movie"),
        _bronze_row(id=2, title="Unreleased Movie", status="Post Production"),
        _bronze_row(
            id=3,
            title="Another Released",
            budget=200_000_000,
            revenue=800_000_000,
            vote_average=7.5,
            vote_count=2000,
            runtime=150,
            release_date="2019-05-20",
            collection={"id": 10, "name": "Franchise X", "poster_path": None, "backdrop_path": None},
        ),
        # edge rows (FIXTURES.md §1): zero votes w/ rating, <=0 runtime,
        # "No Data" sentinel, duplicate id, no director
        _bronze_row(
            id=4,
            title="Zero Votes",
            vote_average=6.0,
            vote_count=0,
            runtime=-5,
            overview="No Data",
            crew=({"id": 4, "name": "Eli", "job": "Producer", "department": "Production"},),
        ),
        _bronze_row(id=1, title="Released Movie Duplicate"),
    ]
    return spark.createDataFrame(rows, schema=schemas.BRONZE_SCHEMA)


@pytest.fixture(scope="module")
def silver(spark, bronze):
    out = movies.curate(bronze)
    out.cache().count()
    return out


def test_curate_filters_status(silver):
    # test_transform.py:60-82 — only Released rows survive (3 unique ids)
    assert sorted(r.id for r in silver.select("id").collect()) == [1, 3, 4]


def test_curate_flattens_genres_to_array(silver):
    # test_transform.py:88-113, as arrays; pipe string at presentation edge
    row = silver.filter("id = 1").first()
    assert row.genres == ["Action", "Adventure"]
    pipe = silver.filter("id = 1").select(flatten.to_pipe_string("genres").alias("g")).first().g
    assert pipe == "Action|Adventure"


def test_curate_converts_to_musd(silver):
    # test_transform.py:116-143
    assert silver.filter("id = 1").first().budget_musd == 100.0
    assert silver.filter("id = 3").first().revenue_musd == 800.0


def test_curate_nulls_unsupported_votes_and_runtime(silver):
    row = silver.filter("id = 4").first()
    assert row.vote_average is None  # vote_count = 0 (clean_transform.py:140-143)
    assert row.runtime is None  # <= 0 nulled (clean_transform.py:124-129)
    assert row.overview is None  # "No Data" sentinel (clean_transform.py:146-150)


def test_curate_extracts_first_director_null_safe(silver):
    assert silver.filter("id = 1").first().director == "Dana"
    assert silver.filter("id = 4").first().director is None


def test_curate_dedups_by_id_deterministically(silver):
    # duplicate id=1: keeps 'Released Movie' (title tiebreak)
    assert silver.filter("id = 1").count() == 1
    assert silver.filter("id = 1").first().title == "Released Movie"


def test_curate_types(silver):
    types = dict(silver.dtypes)
    assert types["id"] == "int" and types["vote_count"] == "int"
    assert types["release_date"] == "date"
    assert types["genres"] == "array<string>"


def test_curate_flattens_companies_countries_languages(silver):
    # clean_transform.py:85-90: companies keep names, countries/languages ISO
    row = silver.filter("id = 1").first()
    assert row.production_companies == ["WB"]
    assert row.production_countries == ["US"]
    assert row.spoken_languages == ["en"]


def test_silver_matches_declared_contract(silver):
    # exact projection, reference order (clean_transform.py:161-171)
    assert silver.columns == list(movies.SILVER_COLUMNS)
    schemas.validate(silver, schemas.SILVER_SCHEMA, layer="silver")


# --- KPI layer on the FIXTURES.md §2 silver sample ------------------------


@pytest.fixture(scope="module")
def kpi_silver(spark):
    rows = [
        # id, title, budget_musd, revenue_musd, vote_avg, vote_cnt, popularity, runtime, genres, cast, director, collection
        (1, "Blockbuster", 200.0, 2000.0, 8.5, 5000, 100.0, 140, ["Action", "Adventure"], ["A Star"], "Director A", "Marvel"),
        (2, "Flop", 150.0, 50.0, 4.0, 500, 20.0, 95, ["Drama"], ["B Star"], "Director B", None),
        (3, "Indie Hit", 10.0, 200.0, 9.0, 2000, 60.0, 105, ["Drama", "Romance"], ["C Star"], "Director C", None),
        (4, "Sequel", 180.0, 800.0, 7.0, 3000, 80.0, 130, ["Action"], ["A Star"], "Director A", "Marvel"),
        (5, "Low Budget", 5.0, 100.0, 7.5, 100, 30.0, 88, ["Horror"], ["D Star"], "Director D", None),
    ]
    cols = [
        "id", "title", "budget_musd", "revenue_musd", "vote_average", "vote_count",
        "popularity", "runtime", "genres", "cast", "director", "collection_name",
    ]
    return spark.createDataFrame(rows, cols)


def test_prepare_kpis_profit_and_roi(kpi_silver):
    # test_kpis.py:54-85 / :143-184
    out = {r.id: r for r in movies.prepare_kpis(kpi_silver).collect()}
    assert out[1].profit_musd == 1800.0
    assert out[2].profit_musd == -100.0
    assert out[3].roi == 20.0
    assert out[5].roi is None  # budget below the >= 10 floor


def test_movie_kpis_highest_roi_and_revenue(kpi_silver):
    kpis = movies.movie_kpis(kpi_silver, top_n=5)
    roi = kpis["highest_roi"].collect()
    assert roi[0].title == "Indie Hit" and roi[0].roi == 20.0
    assert all(r.budget_musd >= 10 for r in roi)  # Low Budget excluded
    rev = [r.title for r in kpis["highest_revenue"].collect()]
    assert rev[:3] == ["Blockbuster", "Sequel", "Indie Hit"]
    assert len(movies.movie_kpis(kpi_silver, top_n=2)["most_popular"].collect()) == 2


def test_search_genre_cast(kpi_silver):
    out = movies.search_genre_cast(kpi_silver, genres=("Action",), cast=("A Star",))
    assert [r.title for r in out.collect()] == ["Blockbuster", "Sequel"]  # rating desc


def test_search_cast_director(kpi_silver):
    out = movies.search_cast_director(kpi_silver, actor="A Star", director="Director A")
    assert sorted(r.id for r in out.collect()) == [1, 4]


def test_franchise_vs_standalone(kpi_silver):
    # test_kpis.py:187-215 — 2 franchise, 3 standalone
    out = {r.kind: r for r in movies.franchise_vs_standalone(kpi_silver).collect()}
    assert out["Franchise"].n_movies == 2
    assert out["Standalone"].n_movies == 3
    assert out["Franchise"].mean_revenue == 1400.0
    assert out["Franchise"].median_roi == round((2000 / 200 + 800 / 180) / 2, 2)


def test_top_franchises_and_directors(kpi_silver):
    fr = movies.top_franchises(kpi_silver).collect()
    assert fr[0].collection_name == "Marvel" and fr[0].total_revenue == 2800.0
    dr = movies.top_directors(kpi_silver).collect()
    assert dr[0].director == "Director A" and dr[0].n_movies == 2
    assert all(r.director is not None for r in dr)
