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
from ..session import CHECKPOINT_LEVEL

# two large primes for the convergence signatures: raw sums of 64-bit-hash
# node ids overflow long (ANSI mode throws), and a single modded sum has a
# ~1e-9 per-round collision chance of stopping early with a silently wrong
# answer; requiring BOTH mod-sums (plus the count) to repeat pushes that
# below ~1e-18 — labels only ever decrease, so a false "no change" needs a
# total decrease that is simultaneously ≡0 mod both primes
_P1 = 1_000_000_007
_P2 = 998_244_353


def _sig_of(df: DataFrame, hashed: F.Column) -> tuple:
    """Order-insensitive convergence signature of ``hashed`` over ``df``:
    (count, Σ pmod(h, P1), Σ pmod(h, P2)).  The mod-sums accumulate as
    ``decimal(38,0)`` — summing int64 pmods would itself overflow long
    past ~9e9 rows, exactly the corpus scale this operator targets."""
    dec = "decimal(38,0)"
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.pmod(hashed, F.lit(_P1)).cast(dec)), F.lit(0).cast(dec)).alias("h1"),
        F.coalesce(F.sum(F.pmod(hashed, F.lit(_P2)).cast(dec)), F.lit(0).cast(dec)).alias("h2"),
    ).collect()[0]
    return row["n"], row["h1"], row["h2"]


def _label_sig(labels: DataFrame) -> tuple:
    return _sig_of(labels, F.col("component"))


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
    pairs = pairs.localCheckpoint(storageLevel=CHECKPOINT_LEVEL)
    und = pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))

    # lazy localCheckpoint: the convergence aggregate below is the action
    # that materializes it — one job per round, not two
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    )
    prev_sig = _label_sig(labels)

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
            .localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
        )
        cur_sig = _label_sig(labels)
        if cur_sig == prev_sig:
            return labels
        prev_sig = cur_sig

    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds; "
        "component diameter is pathological — use connected_components_star"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_rounds: int = 40,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log² n) rounds regardless of component diameter, where
    plain min-label propagation needs O(diameter) rounds.

    Each operation rewrites the edge set toward a star per component
    (every node pointing at the component minimum):

    - **large-star**: for every node u with neighborhood Γ(u), connect
      each strictly-larger neighbor to m(u) = min(Γ(u) ∪ {u}).
    - **small-star**: orient edges toward the larger endpoint; connect
      each smaller-or-equal neighbor (and u itself) to the local min.

    Both are the same physical shape as one propagation round — a
    groupBy-min plus a join-free re-emit — so the upgrade costs no new
    shuffle machinery, only more of the same rounds logic.  Returns
    (node, component) like :func:`connected_components`; the fixpoint is
    detected when the canonical edge multiset stops changing (compared by
    count + xxhash sum — both order-insensitive).
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # nodes are collected BEFORE dropping self-loops so a node appearing
    # only as (x, x) still comes back as its own singleton component —
    # matching connected_components' semantics exactly
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(storageLevel=CHECKPOINT_LEVEL)
    )
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(storageLevel=CHECKPOINT_LEVEL)
    )

    def sig(df: DataFrame) -> tuple:
        # canonical edge-multiset signature (shared _sig_of machinery —
        # see its decimal-accumulation rationale)
        return _sig_of(df, F.xxhash64("u", "v"))

    prev = sig(e)
    for _ in range(max_rounds):
        # large-star: bidirectional neighborhoods, min over Γ(u) ∪ {u}
        bid = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = bid.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            bid.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.least("v", "m").alias("u"), F.greatest("v", "m").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
        )
        e = large.distinct().localCheckpoint(storageLevel=CHECKPOINT_LEVEL)

        # small-star: edges already point small->large after canonicalize;
        # group by the LARGE endpoint, link its small neighbors + itself to
        # the local min
        smin = e.groupBy(F.col("v").alias("c")).agg(
            F.min("u").alias("m")
        )
        sm_nbrs = e.select(F.col("v").alias("c"), F.col("u").alias("n"))
        sm_self = e.select(F.col("v").alias("c"), F.col("v").alias("n"))
        small = (
            sm_nbrs.union(sm_self)
            .join(smin, "c")
            .select(
                F.least("n", "m").alias("u"), F.greatest("n", "m").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
        )
        e = small.distinct().localCheckpoint(storageLevel=CHECKPOINT_LEVEL)

        cur = sig(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} rounds"
        )

    # at the fixpoint e is a star per component: (min, member) pairs
    labels = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    return all_nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
