"""Nested-data flattening (SURVEY.md §2.8 F1-F5, F16; §2.2 P4).

The reference flattens TMDB's nested structs/arrays with higher-order
functions (``transform/clean_transform.py:80-113``) — the idiomatic choice we
keep: lambdas inside ``F.transform``/``F.filter`` compile to Catalyst
expressions, not Python UDFs (no serialization boundary, SURVEY.md §2.10).

Deviation per SURVEY.md §1.4: arrays stay ``array<string>`` internally;
pipe-joined strings (``concat_ws("|", ...)``, ``clean_transform.py:83-90``)
exist only at the presentation edge — the reference pays for early
stringification by re-splitting in pandas (``visualize.py:79-82``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ColumnOrName, _col


def names_of(structs: ColumnOrName, field: str = "name") -> Column:
    """F1: ``array<struct>`` → ``array<string>`` of one field
    (``clean_transform.py:83-90``)."""
    return F.transform(_col(structs), lambda x: x[field])


def where_field_equals(structs: ColumnOrName, field: str, value: str) -> Column:
    """F2: filter struct array by field value — the reference's
    crew→directors (``clean_transform.py:102``)."""
    return F.filter(_col(structs), lambda x: x[field] == value)


def first_element(arr: ColumnOrName) -> Column:
    """F5: null-safe first element — ``try_element_at(arr, 1)`` replaces the
    reference's ``when(size(arr) > 0, arr[0])`` guard
    (``clean_transform.py:99-110``). ``try_`` variant: plain ``element_at``
    THROWS on an empty array when the caller's session runs ANSI-on
    (Spark 4 default)."""
    return F.try_element_at(_col(arr), F.lit(1))


def array_size(arr: ColumnOrName) -> Column:
    """F4: ``cast_size``/``crew_size`` (``clean_transform.py:98,111``)."""
    return F.size(_col(arr))


def to_pipe_string(arr: ColumnOrName) -> Column:
    """F3, presentation edge only (``clean_transform.py:83-90``)."""
    return F.concat_ws("|", _col(arr))


def from_pipe_string(c: ColumnOrName) -> Column:
    """F16 inverse — for reading reference-shaped silver data."""
    return F.split(_col(c), r"\|")


def explode_array(df: DataFrame, arr: ColumnOrName, alias: str, keep: tuple[str, ...] = ()) -> DataFrame:
    """F16/A6: un-nest + keep carry columns. The reference does this in
    pandas (``visualize.py:79-82``); in Spark it's a generator expression
    inside codegen — distributed, no driver bottleneck."""
    return df.select(*keep, F.explode(_col(arr)).alias(alias))


def flatten_struct(df: DataFrame, struct_col: str, fields: tuple[str, ...], prefix: str = "") -> DataFrame:
    """P4: pull struct fields up to top level (``belongs_to_collection.name``,
    ``clean_transform.py:82``)."""
    return df.select(
        "*",
        *[F.col(f"{struct_col}.{f}").alias(f"{prefix}{f}") for f in fields],
    )


def melt_numeric_udtf():
    """POLYMORPHIC Python UDTF (Spark 4): melt every numeric field of a
    struct argument into (measure, value) rows, with the argument's type
    inspected at ANALYSIS time (`analyze()` static method) — the
    dynamic-schema tier of the UDTF API that the fixed-schema
    ``word_chunk_udtf`` doesn't exercise. A non-struct or numeric-free
    argument fails at planning, not at runtime, which is the point of
    analyze-time validation. Values surface as doubles; melt AFTER any
    exact decimal aggregation (the declared query does), never before.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    numeric_types = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType,
    )

    class MeltNumeric:
        @staticmethod
        def analyze(row: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(row.dataType, T.StructType):
                raise ValueError(
                    f"melt_numeric expects a struct argument, got {row.dataType}"
                )
            if not any(
                isinstance(f.dataType, numeric_types) for f in row.dataType.fields
            ):
                raise ValueError("struct has no numeric fields to melt")
            return AnalyzeResult(
                T.StructType(
                    [
                        T.StructField("measure", T.StringType()),
                        T.StructField("value", T.DoubleType()),
                    ]
                )
            )

        def eval(self, row):
            if row is None:
                return
            for k, v in row.asDict().items():
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    yield (k, float(v))

    return udtf(MeltNumeric)
