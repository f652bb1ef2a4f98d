"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"; north-star extension, no reference
analogue).

Pipeline: cluster embeddings with a cheap coarse quantizer, then drop all
but one representative from every within-cluster ε-ball of cosine
similarity.  This removes *semantic* duplicates (paraphrases, templated
rewrites) that byte/shingle dedup cannot see.

Spark-first shape, every stage exact and oracle-checkable:

1. **Assignment** — the pinned integer coarse quantizer of
   :mod:`.ivf_centroids` (same literals as IVF ANN): broadcast nlist
   centroid rows, map-side argmin, no shuffle.
2. **Within-cluster pairs** — :func:`..similarity.blocked_cosine_pairs_np`:
   one numpy int64 matmul per cluster block, pairs only materialized above
   the threshold.  Work is ∝ Σ cluster², the SemDeDup design point (the
   quantizer bounds cluster sizes; at 100 TB you raise nlist so blocks fit
   an executor, exactly like IVF list sizing).
3. **Survivor rule** — deterministic and non-iterative: a vector is
   dropped iff it has ANY near-duplicate with a smaller id.  This keeps
   the minimum-id member of every near-dup chain in one aggregation (a
   chain's non-minimum members all see a smaller peer); it can drop a
   vector whose smaller peer was itself dropped, i.e. it prunes at least
   as hard as exact ε-ball clustering — the conservative direction for
   dedup.  Exact duplicate-cluster semantics are available separately via
   :mod:`.components` over the pair list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ann import pinned_centroid_ranks
from .similarity import blocked_cosine_pairs_np
from ..session import CHECKPOINT_LEVEL


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    centroids: list[list[int]] | None = None,
    scale: int = 1000,
) -> DataFrame:
    """Per-vector SemDeDup verdict: (vec_id, cluster_id, n_dup_peers,
    is_dropped).

    ``n_dup_peers`` counts the vector's ≥threshold within-cluster
    neighbors (0 for singletons); ``is_dropped`` marks every vector that
    has such a neighbor with a smaller id (the chain-minimum survives;
    see the module docstring for the exact pruning semantics).
    """
    assign = (
        pinned_centroid_ranks(df, id_col, vec_col, centroids, scale)
        .filter(F.col("__pr") == 1)
        .select(F.col("vid").alias("vec_id"), F.col("cid").alias("cluster_id"))
    )
    with_cid = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__vec")
    ).join(assign, "vec_id")
    # materialize the pair list once: the peers union below consumes it on
    # BOTH sides, and lazily the whole upstream (assignment window + per-
    # cluster matmul kernel) would execute twice — the plan pin in
    # tests/test_plans.py holds this at one FlatMapGroupsInPandas
    pairs = blocked_cosine_pairs_np(
        with_cid, "vec_id", "__vec", block_col="cluster_id",
        threshold=threshold, scale=scale,
    ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    # peers per vector (either side of the a<b pair), dropped = any smaller peer
    peers = (
        pairs.select(F.col("a_id").alias("vec_id"), F.col("b_id").alias("peer"))
        .unionByName(
            pairs.select(F.col("b_id").alias("vec_id"), F.col("a_id").alias("peer"))
        )
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_peers"),
            F.max(F.col("peer") < F.col("vec_id")).alias("__has_smaller"),
        )
    )
    return assign.join(peers, "vec_id", "left").select(
        "vec_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.coalesce("n_dup_peers", F.lit(0)).cast("long").alias("n_dup_peers"),
        F.coalesce("__has_smaller", F.lit(False)).alias("is_dropped"),
    )
