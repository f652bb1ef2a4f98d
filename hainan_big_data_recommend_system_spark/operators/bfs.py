"""Bounded-depth distributed BFS — seed-set neighborhoods on a graph.

Pregel-shaped frontier expansion: each round joins the current frontier
against the symmetrized edge list (one hash shuffle on the frontier
key), anti-joins already-visited nodes, and tags the survivors with the
round number — so the first visit IS the minimum hop count and no
per-node min() pass is needed.  Every round is ``localCheckpoint``ed
(the components.py / pagerank.py discipline): the lineage stays flat
and the edge list is scanned from its materialized form instead of
being recomputed per round.

Scale shape: rounds are bounded by ``max_hops`` (the query contract,
not convergence), each round's shuffle carries only the frontier —
at a 1000-executor scale the cost is O(frontier-degree-sum) per round.
For unbounded reachability use the large-star/small-star connected
components in operators/components.py instead; BFS here answers the
"within K co-purchase hops of the promoted items" question the
reference's recommend flow implies (user_recommend.py's
similar-user expansion is exactly a 2-hop neighborhood walk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..session import CHECKPOINT_LEVEL


def bfs_hops(
    edges: DataFrame,
    u: str,
    v: str,
    seeds: DataFrame,
    node: str,
    max_hops: int,
) -> DataFrame:
    """Min-hop distance (0..max_hops) from any seed, over undirected
    edges.  Returns ``(node, hops)`` for every node reached."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    sym = (
        edges.select(F.col(u).alias("u"), F.col(v).alias("v"))
        .union(edges.select(F.col(v).alias("u"), F.col(u).alias("v")))
        .distinct()
        .localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    )
    dist = (
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    )
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
        )
        dist = dist.union(nxt).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
        frontier = nxt.select("node")
    return dist.select("node", F.col("hops").cast("long").alias("hops"))
