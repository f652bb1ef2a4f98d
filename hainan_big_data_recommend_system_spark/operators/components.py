"""Connected components over a candidate-pair edge list — the final stage
of a near-dup pipeline (pairs → duplicate clusters → one canonical doc per
cluster).  Extends the reference's pairwise dedup (title dedup P10,
`simility_books.py:86-88`) to transitive duplicate groups, which is what a
100 TB corpus clean actually keys its keep/drop decision on.

Algorithm: iterative min-label propagation.  Every node starts labeled
with its own id; each round, every node takes the min label over itself
and its neighbors; at the fixpoint, a node's label is the smallest node id
reachable from it — the canonical member of its component.

Scale notes (the reasons this shape survives a 1000-executor cluster):

- Each round is ONE shuffle: edges join labels on the neighbor endpoint,
  then a map-side-combining min-aggregate on node id.  No global
  synchronization beyond the round barrier.
- Rounds needed = the largest component's diameter.  LSH duplicate
  clusters are near-cliques (every member collides with most others), so
  the diameter is tiny — 2-4 rounds in practice, never O(n).  For general
  graphs with long chains, the alternating large-star/small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14) converges in O(log² n) rounds with the same
  join+min building block; it can replace the propagation loop here
  without touching callers.
- ``localCheckpoint`` after every round truncates the lineage — without
  it the plan doubles per round and the job DAG, not the data, becomes
  the bottleneck.
- Convergence is detected by the strictly-decreasing ``sum(label)``
  monotone: labels only ever decrease, so an unchanged sum IS the
  fixpoint — one cheap aggregate per round, no change-join.

Determinism: all-integer labels and ``min`` make the result independent
of execution order, partitioning, and retries — the operator is
oracle-checkable against a recursive-CTE transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_rounds: int = 25,
) -> DataFrame:
    """Label each node of the undirected graph ``edges`` with the minimum
    node id in its connected component.

    Returns (node, component).  Nodes = every id appearing in ``edges``;
    isolated docs never enter the pair list and are their own implicit
    singleton components.  Raises if ``max_rounds`` is hit without
    reaching the fixpoint (pathological diameter — switch to
    large-star/small-star before raising the cap).
    """
    # materialize the (possibly expensive) pair pipeline exactly once —
    # the undirected union below references it twice, and lazily that
    # would run the upstream plan twice inside one job
    pairs = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    pairs = pairs.localCheckpoint()
    und = pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))

    # lazy localCheckpoint: the convergence aggregate below is the action
    # that materializes it — one job per round, not two
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    for _ in range(max_rounds):
        neighbor_min = (
            und.join(labels, und.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("component"))
        )
        labels = (
            labels.unionByName(neighbor_min)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum

    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds; "
        "component diameter is pathological — use large-star/small-star"
    )
