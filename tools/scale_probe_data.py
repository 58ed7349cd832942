#!/usr/bin/env python
"""Build a larger deterministic probe dataset by key-offset replication of
sf0.1 (VERDICT_r12 item 5: one higher-SF scaling probe of the top heavies).

/root/testdata is read-only and the driver's generator is not available, so
the probe data is derived: K copies of every fact table with all join keys
offset by copy*stride (strides = max_key+1 per key family, so referential
integrity is preserved copy-locally and copies never collide). Dimension
tables (region, nation) stay single-copy — their keys are referenced
unchanged. Event timestamps keep their values (window/density shapes
unchanged); document text is copied verbatim (cross-copy exact/near
duplicates DO appear — dedup pair density grows superlinearly, which is the
honest stress for the dedup family); embeddings get one coordinate
deterministically perturbed per copy (+copy*1e-3 on coordinate 0) so the
similarity geometry is not a degenerate K-fold duplication of every point.

This data feeds ONLY the scaling probe in SCALE.md (wall-clock ratios at 8
vs 32 cores); it is never an oracle or bench input.

Usage: python tools/scale_probe_data.py [K] [outdir]   (default K=3)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

KEYED = {
    # table -> {column: stride-family}
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "evt", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DIMENSION = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/scaledata/sf{0.1 * k:g}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    strides: dict[str, int] = {}
    fam_max: dict[str, int] = {}
    for t, cols in KEYED.items():
        for c, fam in cols.items():
            m = con.execute(
                f"select max({c}) from read_parquet('{SRC}/{t}.parquet')"
            ).fetchone()[0]
            fam_max[fam] = max(fam_max.get(fam, 0), int(m))
    for fam, m in fam_max.items():
        strides[fam] = m + 1

    for t in DIMENSION:
        con.execute(
            f"copy (select * from read_parquet('{SRC}/{t}.parquet')) "
            f"to '{out}/{t}.parquet' (format parquet)"
        )
        print(f"{t}: copied (dimension)")

    for t, cols in KEYED.items():
        parts = []
        for copy in range(k):
            sel = []
            for row in con.execute(
                f"describe select * from read_parquet('{SRC}/{t}.parquet')"
            ).fetchall():
                name = row[0]
                if name in cols:
                    sel.append(f"{name} + {copy * strides[cols[name]]} AS {name}")
                elif t == "embeddings" and name == "embedding" and copy > 0:
                    sel.append(
                        f"list_concat([embedding[1] + {copy} * 1e-3], "
                        f"embedding[2:]) AS embedding"
                    )
                else:
                    sel.append(name)
            parts.append(
                f"select {', '.join(sel)} from read_parquet('{SRC}/{t}.parquet')"
            )
        con.execute(
            f"copy ({' union all '.join(parts)}) to '{out}/{t}.parquet' "
            f"(format parquet)"
        )
        n = con.execute(f"select count(*) from read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows (x{k})")


if __name__ == "__main__":
    main()
