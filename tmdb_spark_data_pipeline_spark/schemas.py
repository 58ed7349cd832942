"""Declared schema contracts for the movie pipeline layers, with an
ENFORCING validator.

The reference declares a ``StructType`` per layer and aborts ingest on
mismatch (``src/schemas.py:14-171``; ``validate_schema`` at
``src/schemas.py:192-199``, invoked from ``ingestion/fetch_movies.py:294-298``;
the human-readable diff printer at ``src/schemas.py:202-229``). This module
keeps that contract but resolves the reference's declared-vs-actual
discrepancies in favor of enforcement: ``SILVER_SCHEMA`` here is exactly what
``pipelines.movies.curate`` emits (the reference's declared Silver schema
includes ``backdrop_path``/``ingestion_date`` columns its own transform never
outputs), and ``validate`` RAISES a structured, field-level error instead of
returning a bool the caller may forget to check.

Documented deviations from the reference Silver (SURVEY.md §1.4): multi-value
columns stay ``array<string>`` (pipe-joining is presentation-only), the
collection column is ``collection_name``, and ``budget/revenue`` are doubles
end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _nullable(name: str, dt: T.DataType) -> T.StructField:
    return T.StructField(name, dt, True)


#: Bronze: the raw TMDB API response shape (reference ``src/schemas.py:14-78``).
#: Used both as the ``from_json`` schema for REST payloads (never inferred)
#: and as the ingest validation gate.
BRONZE_SCHEMA = T.StructType(
    [
        _nullable("id", T.IntegerType()),
        _nullable("title", T.StringType()),
        _nullable("overview", T.StringType()),
        _nullable("tagline", T.StringType()),
        _nullable("release_date", T.StringType()),  # cast to date in Silver
        _nullable("budget", T.LongType()),
        _nullable("revenue", T.LongType()),
        _nullable("runtime", T.IntegerType()),
        _nullable("vote_average", T.DoubleType()),
        _nullable("vote_count", T.LongType()),
        _nullable("popularity", T.DoubleType()),
        _nullable("original_language", T.StringType()),
        _nullable("status", T.StringType()),
        _nullable(
            "genres",
            T.ArrayType(
                T.StructType([_nullable("id", T.IntegerType()), _nullable("name", T.StringType())])
            ),
        ),
        _nullable(
            "belongs_to_collection",
            T.StructType(
                [
                    _nullable("id", T.IntegerType()),
                    _nullable("name", T.StringType()),
                    _nullable("poster_path", T.StringType()),
                    _nullable("backdrop_path", T.StringType()),
                ]
            ),
        ),
        _nullable(
            "production_companies",
            T.ArrayType(
                T.StructType(
                    [
                        _nullable("id", T.IntegerType()),
                        _nullable("logo_path", T.StringType()),
                        _nullable("name", T.StringType()),
                        _nullable("origin_country", T.StringType()),
                    ]
                )
            ),
        ),
        _nullable(
            "production_countries",
            T.ArrayType(
                T.StructType(
                    [_nullable("iso_3166_1", T.StringType()), _nullable("name", T.StringType())]
                )
            ),
        ),
        _nullable(
            "spoken_languages",
            T.ArrayType(
                T.StructType(
                    [_nullable("iso_639_1", T.StringType()), _nullable("name", T.StringType())]
                )
            ),
        ),
        _nullable("poster_path", T.StringType()),
        _nullable("backdrop_path", T.StringType()),
        _nullable(
            "credits",
            T.StructType(
                [
                    _nullable(
                        "cast",
                        T.ArrayType(
                            T.StructType(
                                [
                                    _nullable("id", T.IntegerType()),
                                    _nullable("name", T.StringType()),
                                    _nullable("character", T.StringType()),
                                    _nullable("order", T.IntegerType()),
                                ]
                            )
                        ),
                    ),
                    _nullable(
                        "crew",
                        T.ArrayType(
                            T.StructType(
                                [
                                    _nullable("id", T.IntegerType()),
                                    _nullable("name", T.StringType()),
                                    _nullable("job", T.StringType()),
                                    _nullable("department", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


#: Silver: exactly what ``pipelines.movies.curate`` emits, in the reference's
#: final projection order (``transform/clean_transform.py:159-173``), with the
#: documented deviations (arrays, ``collection_name``).
SILVER_SCHEMA = T.StructType(
    [
        _nullable("id", T.IntegerType()),
        _nullable("title", T.StringType()),
        _nullable("tagline", T.StringType()),
        _nullable("release_date", T.DateType()),
        _nullable("genres", T.ArrayType(T.StringType())),
        _nullable("collection_name", T.StringType()),
        _nullable("original_language", T.StringType()),
        _nullable("budget_musd", T.DoubleType()),
        _nullable("revenue_musd", T.DoubleType()),
        _nullable("production_companies", T.ArrayType(T.StringType())),
        _nullable("production_countries", T.ArrayType(T.StringType())),
        _nullable("vote_count", T.IntegerType()),
        _nullable("vote_average", T.DoubleType()),
        _nullable("popularity", T.DoubleType()),
        _nullable("runtime", T.IntegerType()),
        _nullable("overview", T.StringType()),
        _nullable("spoken_languages", T.ArrayType(T.StringType())),
        _nullable("poster_path", T.StringType()),
        _nullable("cast", T.ArrayType(T.StringType())),
        _nullable("cast_size", T.IntegerType()),
        _nullable("director", T.StringType()),
        _nullable("crew_size", T.IntegerType()),
    ]
)


@dataclass
class SchemaDiff:
    """Field-level comparison of an actual vs an expected schema."""

    missing: dict[str, str] = field(default_factory=dict)  # name -> expected type
    mismatched: dict[str, tuple[str, str]] = field(default_factory=dict)  # name -> (actual, expected)
    extra: dict[str, str] = field(default_factory=dict)  # name -> actual type

    def ok(self, *, allow_extra: bool = False) -> bool:
        return not self.missing and not self.mismatched and (allow_extra or not self.extra)

    def describe(self) -> str:
        lines = []
        for name, exp in sorted(self.missing.items()):
            lines.append(f"  missing   {name}: expected {exp}")
        for name, (act, exp) in sorted(self.mismatched.items()):
            lines.append(f"  mismatch  {name}: actual {act}, expected {exp}")
        for name, act in sorted(self.extra.items()):
            lines.append(f"  extra     {name}: actual {act}")
        return "\n".join(lines) or "  (schemas match)"


class SchemaValidationError(ValueError):
    """Raised by ``validate`` — carries the structured diff."""

    def __init__(self, layer: str, diff: SchemaDiff):
        self.layer = layer
        self.diff = diff
        super().__init__(f"{layer} schema validation failed:\n{diff.describe()}")


def diff_schemas(actual: T.StructType, expected: T.StructType) -> SchemaDiff:
    """Compare by name + data type (nullability intentionally ignored: Spark
    widens nullability through joins/whens; the reference's check also
    compares ``dataType`` only, ``src/schemas.py:192-199``)."""
    a = {f.name: f.dataType for f in actual.fields}
    e = {f.name: f.dataType for f in expected.fields}
    diff = SchemaDiff()
    for name, dt in e.items():
        if name not in a:
            diff.missing[name] = dt.simpleString()
        elif a[name] != dt:
            diff.mismatched[name] = (a[name].simpleString(), dt.simpleString())
    for name, dt in a.items():
        if name not in e:
            diff.extra[name] = dt.simpleString()
    return diff


def validate(
    df: DataFrame,
    expected: T.StructType,
    *,
    layer: str = "frame",
    allow_extra: bool = False,
) -> DataFrame:
    """Fail-fast schema gate: raises ``SchemaValidationError`` with a
    field-level diff on missing columns or type mismatches (and, unless
    ``allow_extra``, on unexpected extras). Returns ``df`` unchanged so it
    can be used inline in a pipeline.

    Unlike the reference's bool-returning ``validate_schema``
    (``src/schemas.py:192-199``), a failure here cannot be silently ignored
    — the enforcement SURVEY.md §7 calls for.
    """
    diff = diff_schemas(df.schema, expected)
    if not diff.ok(allow_extra=allow_extra):
        if allow_extra:
            diff.extra = {}
        raise SchemaValidationError(layer, diff)
    return df
