"""Geospatial blocking join: all point pairs within a distance, without a
cross join.

The spatial twin of the LSH/shingle blocking discipline used everywhere
else in this engine: bucket points into a lat/lon grid whose cell size
covers the search radius, explode each point into its 3x3 cell
neighborhood on ONE side only, equi-join on the cell key, then verify the
exact predicate on the candidates. Every true pair shares a cell with one
of the 9 probes (cell edge >= radius in degrees), so recall is complete;
work is Sum |cell|^2 over neighboring cells, never N^2.

Distance verification uses the equirectangular approximation with a FIXED
mid-latitude scale factor embedded as a literal: pure multiply/add
arithmetic, bit-identical across engines — no libm (sin/asin) in the
comparison path, so an external SQL oracle can reproduce the exact same
candidate set. Valid for region-bounded workloads (the error vs haversine
is O(span^2); for a 1-degree box it is centimeters); swap in haversine for
global data where ulp-level engine agreement is not required.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: meters per degree of latitude (WGS84 mean)
M_PER_DEG_LAT = 111320.0


def within_distance_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    *,
    max_m: float,
    mid_lat_deg: float,
) -> DataFrame:
    """All pairs (id_a < id_b) whose equirectangular distance is at most
    ``max_m`` meters. ``mid_lat_deg`` fixes the longitude scale (embedded
    as a literal so engine and oracle share the exact constant).

    Cell sizes are derived from the radius with a 20% margin, so a true
    pair's endpoints are never more than one cell apart in either axis.
    """
    m_per_deg_lon = M_PER_DEG_LAT * math.cos(math.radians(mid_lat_deg))
    lat_cell = max_m / M_PER_DEG_LAT * 1.2
    lon_cell = max_m / m_per_deg_lon * 1.2
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        F.floor(F.col(lat_col) / lat_cell).alias("cy"),
        F.floor(F.col(lon_col) / lon_cell).alias("cx"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    probes = base.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(offsets).alias("__o"),
        "cy",
        "cx",
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        (F.col("cy") + F.col("__o.dy")).alias("cy"),
        (F.col("cx") + F.col("__o.dx")).alias("cx"),
    )
    cand = probes.join(
        base.select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            "cy",
            "cx",
        ),
        ["cy", "cx"],
    ).filter(F.col("id_a") < F.col("id_b"))
    dy_m = (F.col("lat_b") - F.col("lat_a")) * F.lit(M_PER_DEG_LAT)
    dx_m = (F.col("lon_b") - F.col("lon_a")) * F.lit(m_per_deg_lon)
    dist = F.sqrt(dy_m * dy_m + dx_m * dx_m)
    return cand.filter(dist <= F.lit(float(max_m))).select(
        "id_a", "id_b", F.round(dist, 2).alias("dist_m")
    )
