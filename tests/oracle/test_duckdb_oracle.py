"""Driver-mimicking correctness harness: run every declared query in Spark
AND its DuckDB oracle on the same parquet tables, canonicalize (sort columns
by name, sort rows, stringify) and compare — the local stand-in for the
driver's CORRECTNESS gate (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from tmdb_spark_data_pipeline_spark.plans.queries import REGISTRY
from tmdb_spark_data_pipeline_spark.sources.io import TPCH_TABLES

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

ORACLE_NAMES = [name for name, spec in REGISTRY.items() if spec.oracle is not None]
ROWS_ONLY_NAMES = [name for name, spec in REGISTRY.items() if spec.oracle is None]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style canonicalization: fixed precision, no trailing-zero noise
        return f"{v:.10g}"
    return str(v)


def _canon(rows, columns) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(spec.oracle)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} (spark) != {len(duck_rows)} (duckdb)"
    )
    cs, cd = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(cs, cd) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"


def test_every_declared_query_has_an_oracle():
    """Since round 4 the rows-only tier is EMPTY — every declared query
    carries a DuckDB oracle (portable-hash SimHash, gated HLL). This pin
    turns any future oracle-less addition into a conscious decision."""
    assert ROWS_ONLY_NAMES == []


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, name):  # pragma: no cover - empty tier
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


# --- result-type parity ------------------------------------------------------
# The driver's value hash is type-aware: DuckDB `sum(INTEGER)` yields HUGEINT
# (int128 → float64 through pandas), which hashes differently from Spark's
# BIGINT even when every value matches — that cost `sessionization` its green
# row in round 1. Pin exact type parity for every oracle column.

_DUCK_TO_SPARK = {
    "BOOLEAN": "boolean",
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BLOB": "binary",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
}


def _canon_duck_type(t) -> str:
    s = str(t)
    if s.startswith("DECIMAL"):
        return s.replace("DECIMAL", "decimal").replace(" ", "")
    if s.endswith("[]"):
        return f"array<{_canon_duck_type(s[:-2])}>"
    return _DUCK_TO_SPARK.get(s, f"<no spark twin: {s}>")


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_types_match_spark(spark, duck, name):
    spec = REGISTRY[name]
    stypes = {f.name: f.dataType.simpleString() for f in spec.fn(spark, SF_DIR).schema.fields}
    rel = duck.sql(spec.oracle)
    dtypes = dict(zip(rel.columns, (_canon_duck_type(t) for t in rel.types)))
    # int-vs-bigint passes the driver hash (both land as integer values);
    # everything else (HUGEINT, float-vs-double, decimal scale) must be exact.
    skews = {
        col: (stypes.get(col), dtypes.get(col))
        for col in set(stypes) | set(dtypes)
        if stypes.get(col) != dtypes.get(col)
        and {stypes.get(col), dtypes.get(col)} != {"int", "bigint"}
    }
    assert not skews, f"{name}: oracle/spark result-type skew {skews}"
