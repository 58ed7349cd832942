"""Visualization data-prep (reference stage 4) and upsert tests."""

from __future__ import annotations

from datetime import date

import pytest

from tmdb_spark_data_pipeline_spark.operators import cleaning
from tmdb_spark_data_pipeline_spark.pipelines import viz


@pytest.fixture(scope="module")
def silver(spark):
    rows = [
        (1, 100.0, 500.0, ["Action", "Adventure"], date(2019, 1, 1), 50.0, 8.0),
        (2, 20.0, 100.0, ["Action"], date(2019, 6, 1), 30.0, 7.0),
        (3, 5.0, 100.0, ["Drama"], date(2020, 1, 1), 20.0, 9.0),  # budget < 10 → no ROI
    ]
    return spark.createDataFrame(
        rows,
        "id int, budget_musd double, revenue_musd double, genres array<string>, release_date date, popularity double, vote_average double",
    )


def test_genre_roi_is_computed_in_spark(silver):
    out = {r.genre: (r.mean_roi, r.n_movies) for r in viz.genre_roi_data(silver).collect()}
    assert out == {"Action": (5.0, 2), "Adventure": (5.0, 1)}  # Drama excluded (budget floor)


def test_yearly_revenue_data(silver):
    out = [(r.year, r.mean_revenue) for r in viz.yearly_revenue_data(silver).collect()]
    assert out == [(2019, 300.0), (2020, 100.0)]


def test_popularity_vs_rating_topn(silver):
    out = viz.popularity_vs_rating_data(silver, sample_n=2).collect()
    assert [r.id for r in out] == [1, 2]


def test_render_png_is_stubbed_without_matplotlib(silver, tmp_path):
    try:
        import matplotlib  # noqa: F401

        pytest.skip("matplotlib installed; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        viz.render_png(viz.yearly_revenue_data(silver), str(tmp_path / "x.png"))


def test_upsert_by_key_updates_win_and_pass_through(spark):
    existing = spark.createDataFrame([(1, "old"), (2, "keep")], ["id", "v"])
    updates = spark.createDataFrame([(1, "new"), (3, "ins")], ["id", "v"])
    out = {r.id: r.v for r in cleaning.upsert_by_key(existing, updates, ("id",)).collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}
