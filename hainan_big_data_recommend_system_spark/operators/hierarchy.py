"""Hierarchy resolution by POINTER DOUBLING — log-depth, not walk-depth.

Category trees, org charts, BOM graphs: the per-node question is
"which root do I belong to, and how deep am I?".  A sequential walk is
O(depth) dependent joins; pointer doubling (a.k.a. pointer jumping —
the classic PRAM technique, also the engine inside the large-star
components in operators/components.py) squares the known-ancestor
pointer every round, so ``ceil(log2(max_depth))`` self-joins resolve
EVERY node: round k knows each node's 2^k-th ancestor and the distance
to it; composing two states (node→ptr, ptr→ptr') adds distances.
Roots carry a self-pointer at distance 0, making the composition
idempotent at the fixpoint — extra rounds are harmless no-ops.

Scale shape: each round is ONE hash equi-join of the state with itself
on the pointer (localCheckpointed, flat lineage); 6 rounds covers any
hierarchy of depth ≤ 64 — deeper than any real category tree — where a
naive walk would take 64 dependent joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..session import CHECKPOINT_LEVEL


def resolve_roots(
    nodes: DataFrame,
    node_col: str,
    parent_col: str,
    rounds: int = 6,
) -> DataFrame:
    """``(node, root, depth)`` for a forest given ``(node, parent)``
    rows (parent NULL ⇔ root).  ``rounds`` doubling steps resolve
    depth ≤ 2^rounds."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    state = nodes.select(
        F.col(node_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(node_col)).alias("ptr"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("dist"),
    ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    for _ in range(rounds):
        hop = state.select(
            F.col("node").alias("p_node"),
            F.col("ptr").alias("p_ptr"),
            F.col("dist").alias("p_dist"),
        )
        state = (
            state.join(hop, state["ptr"] == hop["p_node"])
            .select(
                "node",
                F.col("p_ptr").alias("ptr"),
                (F.col("dist") + F.col("p_dist")).alias("dist"),
            )
            .localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
        )
    return state.select(
        "node",
        F.col("ptr").alias("root"),
        F.col("dist").alias("depth"),
    )
