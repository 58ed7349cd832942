"""Schema-contract enforcement (≙ reference ``src/schemas.py:192-229`` +
``fetch_movies.py:294-298``) and config externalization
(≙ ``src/utils/config.py:23-125``)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tmdb_spark_data_pipeline_spark import schemas
from tmdb_spark_data_pipeline_spark.pipelines import movies
from tmdb_spark_data_pipeline_spark.pipelines.config import (
    DEFAULT_CONFIG,
    MoviePipelineConfig,
    config_from_dict,
    load_config,
)


def test_validate_passes_matching_frame(spark):
    df = spark.createDataFrame([(1, "x")], schema="id int, title string")
    expected = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("title", T.StringType())]
    )
    assert schemas.validate(df, expected) is df


def test_validate_rejects_wrong_type_with_field_diff(spark):
    df = spark.createDataFrame([("1", "x")], schema="id string, title string")
    expected = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("title", T.StringType())]
    )
    with pytest.raises(schemas.SchemaValidationError) as exc:
        schemas.validate(df, expected, layer="bronze")
    assert exc.value.layer == "bronze"
    assert exc.value.diff.mismatched == {"id": ("string", "int")}
    assert "mismatch  id: actual string, expected int" in str(exc.value)


def test_validate_rejects_missing_column(spark):
    df = spark.createDataFrame([(1,)], schema="id int")
    expected = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("title", T.StringType())]
    )
    with pytest.raises(schemas.SchemaValidationError) as exc:
        schemas.validate(df, expected)
    assert exc.value.diff.missing == {"title": "string"}


def test_validate_extra_columns_gated_by_allow_extra(spark):
    df = spark.createDataFrame([(1, "x", 0.5)], schema="id int, title string, bonus double")
    expected = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("title", T.StringType())]
    )
    schemas.validate(df, expected, allow_extra=True)  # API may grow — tolerated
    with pytest.raises(schemas.SchemaValidationError) as exc:
        schemas.validate(df, expected)
    assert exc.value.diff.extra == {"bonus": "double"}


def test_curate_rejects_wrong_typed_bronze(spark):
    # vote_average as string: the gate must fail fast with the field named
    bad = spark.createDataFrame([("1", "t")], schema="id string, title string")
    with pytest.raises(schemas.SchemaValidationError) as exc:
        movies.curate(bad)
    assert "id" in exc.value.diff.mismatched or "id" in exc.value.diff.missing


def test_curate_skips_gate_when_disabled(spark):
    # partial frames are usable with validation off (library mode)
    cfg = MoviePipelineConfig(validate_schemas=False, min_non_null=0)
    partial = spark.createDataFrame(
        [(1, "t", "Released", 1000, 2000)],
        schema="id int, title string, status string, budget long, revenue long",
    )
    out = movies.curate(partial, config=cfg)
    assert out.count() == 1


# --- config externalization -------------------------------------------------


def test_config_overlay_and_unknown_key():
    cfg = config_from_dict({"min_budget_for_roi": 25.0, "default_top_n": 3})
    assert cfg.min_budget_for_roi == 25.0 and cfg.default_top_n == 3
    assert cfg.min_non_null == DEFAULT_CONFIG.min_non_null  # untouched
    with pytest.raises(KeyError, match="min_budget_for_roii"):
        config_from_dict({"min_budget_for_roii": 1.0})


def test_load_config_json_roundtrip(tmp_path):
    p = tmp_path / "pipeline.json"
    p.write_text(json.dumps({"default_top_n": 2, "sentinels": ["No Data", "N/A"]}))
    cfg = load_config(str(p))
    assert cfg.default_top_n == 2
    assert cfg.sentinels == ("No Data", "N/A")


def test_movie_kpis_driven_by_injected_specs(spark):
    rows = [
        (1, "A", 10.0, 100.0, 8.0, 100, 5.0),
        (2, "B", 20.0, 50.0, 6.0, 200, 9.0),
    ]
    cols = ["id", "title", "budget_musd", "revenue_musd", "vote_average", "vote_count", "popularity"]
    silver = spark.createDataFrame(rows, cols)
    cfg = MoviePipelineConfig(
        kpi_specs={"by_popularity": {"metric": "popularity", "order": "desc"}},
        default_top_n=1,
    )
    kpis = movies.movie_kpis(silver, config=cfg)
    assert list(kpis) == ["by_popularity"]
    assert [r.id for r in kpis["by_popularity"].collect()] == [2]


def test_injected_roi_floor_changes_prepare_kpis(spark):
    silver = spark.createDataFrame(
        [(1, "A", 15.0, 150.0)], ["id", "title", "budget_musd", "revenue_musd"]
    )
    strict = movies.prepare_kpis(silver, config=MoviePipelineConfig(min_budget_for_roi=20.0))
    assert strict.first().roi is None  # 15 < injected 20 floor
    default = movies.prepare_kpis(silver)
    assert default.first().roi == 10.0
