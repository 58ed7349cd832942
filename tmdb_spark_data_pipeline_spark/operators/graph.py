"""Graph-motif operators over edge lists.

Triangle counting via DEGREE ORIENTATION (the node-iterator++ / forward
algorithm): orient every undirected edge from its lower-(degree, id)
endpoint to the higher one. Out-degrees are then bounded by O(√m) on ANY
graph, so enumerating wedges (pairs of out-neighbors per apex) costs
Σ outdeg² ≈ m^1.5 instead of the Σ deg² a hub node turns quadratic — the
difference between finishing and not finishing on a power-law graph at
100 TB. Each triangle has exactly one apex with two out-edges under the
orientation total order, so one equi-join against the canonical edge set
counts every triangle exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(edges: DataFrame, u_col: str = "u", v_col: str = "v") -> DataFrame:
    """Count triangles + wedges + the global clustering coefficient of an
    undirected simple graph given as id-canonical edges (``u < v``, no
    duplicates — the caller's contract).

    Returns one row: (n_nodes, n_edges, n_triangles, n_wedges,
    clustering_coeff). All counts are exact integers; the coefficient is
    the single final double division 3·triangles / wedges.
    """
    e0 = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    deg = (
        e0.select(F.col("u").alias("n"))
        .unionAll(e0.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    oriented = (
        e0.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("__e")
        )
        .select(F.col("__e.s").alias("s"), F.col("__e.t").alias("t"))
    )
    e1 = oriented.select(F.col("s").alias("apex"), F.col("t").alias("b"))
    e2 = oriented.select(F.col("s").alias("apex"), F.col("t").alias("c"))
    wedge = e1.join(e2, "apex").filter(F.col("b") < F.col("c"))
    closing = e0.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri = wedge.join(closing, ["b", "c"]).agg(F.count("*").alias("t"))
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges"),
    )
    n_edges = e0.agg(F.count("*").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            F.col("t").alias("n_triangles"),
            "n_wedges",
            F.round(3.0 * F.col("t") / F.col("n_wedges"), 6).alias(
                "clustering_coeff"
            ),
        )
    )


def propagate_labels(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    rounds: int = 2,
    u_col: str = "u",
    v_col: str = "v",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Seeded synchronous label propagation (label spreading with clamped
    seeds): each round, every still-unlabeled node with at least one
    labeled neighbor takes the MAJORITY label among its labeled neighbors
    (tie → lexicographically smallest label, so the result is independent
    of execution order). Seeds never change; a node labeled in round r
    votes from round r+1 on. The semi-supervised imputation pass — spread
    known categories (brand, topic, language) across a co-occurrence
    graph.

    ``rounds`` is a static unroll (each round = one symmetric-edge join +
    one grouped vote + one windowed argmax — all key-partitioned; no
    driver-side convergence check, unlike ``connected_components``).
    Returns (id, label, round) with round 0 for seeds.
    """
    from pyspark.sql import Window

    sym = edges.select(
        F.col(u_col).alias("src"), F.col(v_col).alias("dst")
    ).unionAll(edges.select(F.col(v_col).alias("src"), F.col(u_col).alias("dst")))
    labels = seeds.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.lit(0).alias("round"),
    )
    for r in range(1, rounds + 1):
        neighbor_labels = sym.join(
            labels.select(F.col("id").alias("dst"), "label"), "dst"
        ).select(F.col("src"), "label")
        unlabeled_votes = neighbor_labels.join(
            labels.select(F.col("id").alias("src")), "src", "left_anti"
        )
        votes = unlabeled_votes.groupBy("src", "label").agg(
            F.count("*").alias("__n")
        )
        w = Window.partitionBy("src").orderBy(
            F.col("__n").desc(), F.col("label").asc()
        )
        pick = (
            votes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                F.col("src").alias("id"), "label", F.lit(r).alias("round")
            )
        )
        labels = labels.unionAll(pick)
    return labels
