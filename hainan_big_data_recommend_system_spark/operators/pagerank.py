"""Integer PageRank over an undirected pair graph — fully oracle-able.

Web-crawl pipelines weight documents by link centrality (harmonic /
PageRank centrality over the host graph is a standard quality feature in
public corpus builds); inside this engine the same statistic over the
NEAR-DUP candidate graph ranks template/boilerplate hubs: a page whose
shingles collide with everything is a hub in the candidate graph and a
prune target.  Complements connected components (:mod:`.components`),
which finds the clusters but not their centers.

PageRank is usually floating-point and order-dependent (a parallel sum
of double contributions has no fixed association order), which would
make cross-engine hashing impossible.  This implementation is exact
integer arithmetic in micro-units:

    r₀(v) = 1_000_000
    rₜ₊₁(v) = 150_000 + (850_000 · Σ_{u∼v} (rₜ(u) div deg(u))) div 1_000_000

— the unnormalized teleport formulation, every term a nonnegative
integer (Spark ``div`` truncates while DuckDB ``//`` floors; nonnegative
keeps them identical), integer sums order-free, a FIXED iteration count
(no float convergence test).  The oracle unrolls the same recurrence as
generated CTE stages from the same Python loop, so the spellings cannot
drift.

Scale shape per iteration: one shuffle join ranks⋈edges on the node key
+ one map-side-combined groupBy — the same cost as one round of
label propagation.  Ranks and degrees are node-sized (≪ edges); each
iteration is localCheckpointed so the plan stays flat instead of
stacking five joins deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..session import CHECKPOINT_LEVEL

TELEPORT_MICRO = 150_000
DAMP_MICRO = 850_000
UNIT = 1_000_000
N_ITER = 5


def pagerank_micro(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    n_iter: int = N_ITER,
) -> DataFrame:
    """``(doc_id, rank_micros)`` after ``n_iter`` exact-integer rounds
    over the symmetrized ``pairs`` graph.  Nodes are pair endpoints
    (degree ≥ 1 by construction — isolated docs have no centrality)."""
    e = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(
            pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        )
        .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    )
    deg = (
        e.groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    )
    r = deg.select("u", F.lit(UNIT).cast("long").alias("r"))
    for _ in range(n_iter):
        contrib = e.join(r, "u").join(deg, "u").select(
            F.col("v"), F.expr("r div d").alias("c")
        )
        r = (
            contrib.groupBy("v")
            .agg(F.sum("c").cast("long").alias("s"))
            .select(
                F.col("v").alias("u"),
                F.expr(
                    f"{TELEPORT_MICRO}L + ({DAMP_MICRO}L * s) div {UNIT}L"
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
        )
    return r.select(F.col("u").alias("doc_id"), F.col("r").alias("rank_micros"))


def pagerank_unrolled_sql(n_iter: int = N_ITER) -> str:
    """The identical recurrence as CTE stages (appended after a ``pairs``
    CTE with columns ``a_id, b_id``), generated from the same constants."""
    stages = [
        """
    e AS (SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY u),
    r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS r FROM deg)"""
    ]
    for i in range(1, n_iter + 1):
        stages.append(
            f"""
    r{i} AS (
        SELECT e.v AS u,
               CAST({TELEPORT_MICRO} + ({DAMP_MICRO} * sum(r{i-1}.r // deg.d))
                    // {UNIT} AS BIGINT) AS r
        FROM e JOIN r{i-1} ON r{i-1}.u = e.u JOIN deg ON deg.u = e.u
        GROUP BY e.v
    )"""
        )
    return (
        ",".join(stages)
        + f"\n    SELECT u AS doc_id, r AS rank_micros FROM r{n_iter}"
    )
