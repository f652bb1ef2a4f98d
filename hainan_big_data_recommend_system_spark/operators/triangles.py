"""Distributed triangle counting — degree-ordered edge orientation.

Triangles are the basic graph-quality signal (clustering, community
density — here: how clique-ish the co-purchase graph is).  The naive
three-way edge self-join explodes on hubs: a degree-d node contributes
O(d²) wedges.  The classical fix (Schank & Wagner 2005; standard in
every distributed graph engine) is to orient each undirected edge from
the LOWER-rank endpoint to the higher, ranking nodes by
``(degree, id)``: every node's OUT-degree is then bounded by O(√m), so
wedge generation — the self-join of out-edges on their source — is
O(m^1.5) worst-case instead of Σd², and each triangle is generated
exactly once (at its lowest-rank vertex).

Spark shape: two aggregations (degrees, per-node counts) and two
shuffled joins (wedge closure on the (v, w) edge key), all on key
columns — no windows, no Python, no driver collection.  Hub skew is
*structurally* removed by the orientation, not salted around.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical_edges(edges: DataFrame, a: str, b: str) -> DataFrame:
    """Distinct undirected edges as (u, v) with u < v; self-loops drop."""
    u, v = F.col(a), F.col(b)
    return (
        edges.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def count_triangles(
    edges: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph:
    ``(node, n_triangles)`` for every node in at least one triangle.
    Exact integers; input edges may be duplicated/reversed (canonical
    dedup is the first step)."""
    e = _canonical_edges(edges, a_col, b_col)
    deg = (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient edge x—y from lower (deg, id) rank to higher
    ranked = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )
    # wedges at the lowest-rank vertex: pairs of out-neighbors ordered
    # by the same (deg, id) rank so each wedge appears once
    lhs = oriented.select("src", F.col("dst").alias("w1"), F.col("ddst").alias("d1"))
    rhs = oriented.select("src", F.col("dst").alias("w2"), F.col("ddst").alias("d2"))
    wedges = lhs.join(rhs, "src").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("w1") < F.col("w2")))
    )
    closing = oriented.select(
        F.col("src").alias("w1"), F.col("dst").alias("w2")
    )
    tris = wedges.join(closing, ["w1", "w2"]).select(
        F.col("src").alias("x"), F.col("w1").alias("y"),
        F.col("w2").alias("z"),
    )
    exploded = (
        tris.select(F.col("x").alias("node"))
        .unionByName(tris.select(F.col("y").alias("node")))
        .unionByName(tris.select(F.col("z").alias("node")))
    )
    return exploded.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
