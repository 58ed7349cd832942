"""Triangle counting (degree-orientation) on crafted graphs."""

from __future__ import annotations

from tmdb_spark_data_pipeline_spark.operators import graph


def _stats(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    return graph.triangle_stats(df).collect()[0]


def test_k4_has_four_triangles(spark):
    # complete graph on 4 nodes: C(4,3)=4 triangles, 12 wedges, coeff 1.0
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    r = _stats(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (4, 6, 4, 12)
    assert r.clustering_coeff == 1.0


def test_hub_star_has_no_triangles(spark):
    # star: hub 0 with 10 leaves — the degree-skew case the orientation
    # bounds; 45 wedges at the hub, zero triangles
    star = [(0, i) for i in range(1, 11)]
    r = _stats(spark, star)
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (11, 10, 0, 45)
    assert r.clustering_coeff == 0.0


def test_triangle_plus_pendant(spark):
    # one triangle with a tail: 1 triangle; wedges = 3 (in triangle)
    # + node 3 has degree 3 -> C(3,2)=3 wedges; total 1+1+3+0 = 5
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    r = _stats(spark, edges)
    assert (r.n_triangles, r.n_wedges) == (1, 5)
