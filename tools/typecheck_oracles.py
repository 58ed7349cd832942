"""Audit DuckDB-oracle result types against Spark result types for every
oracle-bearing declared query.

The driver's value hash is type-aware: a DuckDB HUGEINT (int128, the default
result of ``sum(INTEGER)``) hashes differently from Spark's BIGINT even when
every value is identical — that cost `sessionization` its green row in round 1.
This script runs both sides at a small SF and reports any column whose
canonical type differs, so the oracle can be CAST into alignment.

Usage: python tools/typecheck_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB type id → the Spark simpleString it hashes equal to.
_DUCK_TO_SPARK = {
    "BOOLEAN": "boolean",
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "HUGEINT": "<int128: no Spark twin>",
    "UTINYINT": "<uint8>",
    "USMALLINT": "<uint16>",
    "UINTEGER": "<uint32>",
    "UBIGINT": "<uint64>",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BLOB": "binary",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
}


def canon_duck(t) -> str:
    s = str(t)
    if s.startswith("DECIMAL"):
        return s.replace("DECIMAL", "decimal").replace(" ", "")
    if s.endswith("[]"):
        return f"array<{canon_duck(s[:-2])}>"
    return _DUCK_TO_SPARK.get(s, f"<{s}>")


def canon_spark(dt) -> str:
    return dt.simpleString()


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-typecheck")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs, oracles = mod.queries(), mod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        sdf = fn(spark, SF)
        stypes = {f.name: canon_spark(f.dataType) for f in sdf.schema.fields}
        rel = con.sql(oracles[name])
        dtypes = dict(zip(rel.columns, (canon_duck(t) for t in rel.types)))
        for col in sorted(set(stypes) | set(dtypes)):
            s, d = stypes.get(col, "<missing>"), dtypes.get(col, "<missing>")
            if s != d:
                bad.append((name, col, s, d))
                print(f"SKEW {name}.{col}: spark={s} duck={d}")
    print(f"\n{len(bad)} type skews across {len(oracles)} oracle-bearing queries")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
