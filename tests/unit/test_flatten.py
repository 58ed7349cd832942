"""Nested-data flattening tests (SURVEY.md §2.8 F1-F5, F16) on a TMDB-shaped
nested fixture — the reference's ``transform_bronze`` flattening semantics
(``transform/clean_transform.py:80-113``) re-expressed as operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import flatten


@pytest.fixture(scope="module")
def movies(spark):
    rows = [
        Row(
            id=1,
            title="Alpha",
            genres=[Row(id=28, name="Action"), Row(id=12, name="Adventure")],
            collection=Row(id=10, name="Alpha Collection"),
            crew=[
                Row(name="Dana", job="Director"),
                Row(name="Eli", job="Producer"),
                Row(name="Flo", job="Director"),
            ],
        ),
        Row(id=2, title="Beta", genres=[], collection=None, crew=[Row(name="Gus", job="Producer")]),
    ]
    return spark.createDataFrame(rows)


def test_names_of_extracts_field(movies):
    out = movies.select("id", flatten.names_of("genres").alias("g")).orderBy("id").collect()
    assert out[0].g == ["Action", "Adventure"]
    assert out[1].g == []


def test_where_field_equals_filters_structs(movies):
    out = (
        movies.select("id", flatten.names_of(flatten.where_field_equals("crew", "job", "Director")).alias("d"))
        .orderBy("id")
        .collect()
    )
    assert out[0].d == ["Dana", "Flo"]
    assert out[1].d == []


def test_first_element_is_null_safe(movies):
    directors = flatten.names_of(flatten.where_field_equals("crew", "job", "Director"))
    out = movies.select("id", flatten.first_element(directors).alias("first")).orderBy("id").collect()
    assert out[0].first == "Dana"
    assert out[1].first is None


def test_array_size(movies):
    out = movies.select("id", flatten.array_size("crew").alias("n")).orderBy("id").collect()
    assert [r.n for r in out] == [3, 1]


def test_pipe_string_roundtrip(movies):
    df = movies.select("id", flatten.to_pipe_string(flatten.names_of("genres")).alias("s"))
    row = df.orderBy("id").first()
    assert row.s == "Action|Adventure"
    back = df.select("id", flatten.from_pipe_string("s").alias("arr")).orderBy("id").first()
    assert back.arr == ["Action", "Adventure"]


def test_flatten_struct_pulls_fields_up(movies):
    out = flatten.flatten_struct(movies, "collection", ("name",), prefix="collection_")
    row = out.orderBy("id").first()
    assert row.collection_name == "Alpha Collection"
    assert out.orderBy("id").collect()[1].collection_name is None


def test_explode_array_unnests_with_carry_columns(movies):
    out = flatten.explode_array(movies, flatten.names_of("genres"), "genre", keep=("id",))
    rows = [(r.id, r.genre) for r in out.orderBy("id", "genre").collect()]
    assert rows == [(1, "Action"), (1, "Adventure")]  # empty arrays drop out


def test_explode_then_reaggregate_matches_reference_a6(spark):
    # visualize.py:76-95 in Spark instead of pandas
    df = spark.createDataFrame(
        [("Action|Adventure", 2.0), ("Action", 4.0)], ["genres", "roi"]
    )
    out = (
        df.select(F.explode(flatten.from_pipe_string("genres")).alias("genre"), "roi")
        .groupBy("genre")
        .agg(F.avg("roi").alias("mean_roi"))
        .orderBy("genre")
        .collect()
    )
    assert [(r.genre, r.mean_roi) for r in out] == [("Action", 3.0), ("Adventure", 2.0)]


def test_melt_numeric_udtf_analyze_validation(spark):
    import pytest
    from pyspark.sql.utils import AnalysisException

    from tmdb_spark_data_pipeline_spark.operators.flatten import melt_numeric_udtf

    spark.udtf.register("__melt_t", melt_numeric_udtf())
    df = spark.createDataFrame([(1, 2.5, "x")], "a int, b double, s string")
    df.createOrReplaceTempView("__melt_src")
    out = spark.sql(
        "SELECT t.* FROM __melt_src d, LATERAL __melt_t(struct(d.a, d.b)) t"
    ).collect()
    assert sorted((r.measure, r.value) for r in out) == [("a", 1.0), ("b", 2.5)]
    # analysis-time failure on a numeric-free struct: planning error, not runtime
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT t.* FROM __melt_src d, LATERAL __melt_t(struct(d.s)) t"
        ).collect()
