"""Exact fixed-point rank-1 ALS — the oracle-checkable twin of the
MLlib factorization (qcatalog/reco.py `als_recommendations`).

MLlib ALS is rows-only by nature (float Cholesky solves, block
geometry).  The rank-1 alternating update has a CLOSED FORM per side —

    u_i = Σ_j r_ij·v_j / Σ_j v_j²      (over i's observed items)
    v_j = Σ_i r_ij·u_i / Σ_i u_i²      (over j's observed users)

— which is the alternating power method for the dominant singular
direction of the (sparse) interaction matrix.  Pinning it exactly:

- factors are fixed-point integers at SCALE=1000 (v initialized to
  SCALE for every item — a deterministic all-ones direction);
- each update computes ``num·SCALE div den`` in decimal(38,0) —
  truncating integer division, all quantities non-negative (counts ×
  non-negative factors), so Spark ``div`` and DuckDB ``//`` agree;
- each side is MAX-NORMALIZED back to SCALE after its update (the
  alternating updates are homogeneous of degree −1, so unnormalized
  fixed-point magnitudes oscillate and truncate to zero — the exact
  analogue of the float power method's renormalization step); the max
  is an order-free aggregate, broadcast back as one row;
- a FIXED number of alternations (default 3);
- scoring ranks unseen items per user by the exact integer product
  ``u_i·v_j`` (ties to the lowest item id).

Every stage is order-free integer arithmetic over groupBy sums, so a
generated unrolled SQL chain replays the whole fit — the same
discipline as operators/kmeans_exact.py (Lloyd) and the pinned CMS/HLL
twins.  The MLlib rank-8 row remains the faithful reference port; this
twin puts a collaborative-filtering FIT inside the hash gate.

Scale shape: each iteration is two groupBy-sum shuffles over the
interaction table joined with a BROADCAST factor side (|users| and
|items| rows of (id, int) — the small side by construction at any
scale where rank-1 fits make sense); nothing collects.

Public knowledge: alternating least squares (Koren/Bell/Volinsky 2009)
and the power method; fixed-point determinism is elementary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window, functions as F
from ..session import CHECKPOINT_LEVEL

_SCALE = 1000
_DEC = "decimal(38,0)"


def als_rank1_factors(
    ratings: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "rating",
    iters: int = 3,
    with_bounds: bool = False,
) -> tuple:
    """Run the pinned fixed-point alternations and return the fitted
    factor sides ``(u(u, uf), v(i, v), r(u, i, r))`` — exposed so tests
    can cross-join them as a brute-force oracle for the bounded
    candidate prune in :func:`als_rank1_exact`.

    ``with_bounds=True`` appends a 4th element: the ``(i, v)`` domain
    bounds dict :func:`topk_unseen_from_factors` accepts — the item-id
    min/max observed for free on the final alternation's checkpoint
    job, and the v-range known analytically (max-normalization maps a
    non-zero side exactly onto [0, SCALE])."""
    r = ratings.select(
        F.col(user_col).cast("long").alias("u"),
        F.col(item_col).cast("long").alias("i"),
        F.col(rating_col).cast("long").alias("r"),
    )
    # materialize the interaction table ONCE: every alternation joins
    # it twice and the scoring stage three more times — without this
    # the upstream join/groupBy lineage re-executes ~8× (measured
    # 21.5 → 11.5s cold at sf0.1)
    r = r.localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    # v starts as the all-ones direction at fixed-point scale
    v = r.select("i").distinct().withColumn("v", F.lit(_SCALE))
    u = None
    metrics_v = None
    v_max = None
    for _ in range(iters):
        ru = r.join(F.broadcast(v), "i").groupBy("u").agg(
            F.expr(f"cast(sum(cast(r as {_DEC}) * v) as {_DEC})").alias(
                "__num"
            ),
            F.expr(f"cast(sum(cast(v as {_DEC}) * v) as {_DEC})").alias(
                "__den"
            ),
        )
        u = ru.select(
            "u",
            F.expr(f"cast(__num * {_SCALE} div __den as long)").alias("uf"),
        )
        # checkpoint the RAW update (|users| rows), not the normalized
        # one: the normalization references its input twice (values +
        # max), so an unchecked raw side would re-execute the 600k-row
        # interaction join per reference — measured 2× per alternation
        # before this (the r8→r9 cost fix: 21.5 → ~13s cold at sf0.1).
        # The eager job over a broadcast-joined groupBy is the minimum
        # one pass per alternation; MLlib ALS checkpoints on a cadence
        # for the same lineage-growth reason.  The normalization max
        # rides the SAME job as an observed metric (r15, guide §1/§2:
        # one job per alternation side instead of two — the separate
        # max-aggregate job and its broadcast exchange disappear); the
        # exact integer max then normalizes as a literal.
        obs_u = Observation()
        u = u.observe(obs_u, F.max("uf").alias("__m")).localCheckpoint(
            eager=True, storageLevel=CHECKPOINT_LEVEL
        )
        u_max = obs_u.get["__m"]
        if u_max is None:  # empty side: match greatest(null, 1) = 1
            u_max = 0
        u = u.select(
            "u",
            F.expr(
                f"cast(cast(uf as {_DEC}) * {_SCALE} "
                f"div greatest({u_max}, 1) as long)"
            ).alias("uf"),
        )
        rv = r.join(F.broadcast(u), "u").groupBy("i").agg(
            F.expr(f"cast(sum(cast(r as {_DEC}) * uf) as {_DEC})").alias(
                "__num"
            ),
            F.expr(f"cast(sum(cast(uf as {_DEC}) * uf) as {_DEC})").alias(
                "__den"
            ),
        )
        v = rv.select(
            "i",
            F.expr(f"cast(__num * {_SCALE} div __den as long)").alias("v"),
        )
        # raw side + observed max in one job, same reason as u; the
        # item-id bounds ride the same metrics for free (consumed by
        # the caller's bounds-aware global ranks when with_bounds)
        obs_v = Observation()
        v = v.observe(
            obs_v,
            F.max("v").alias("__m"),
            F.min("i").alias("__lo_i"),
            F.max("i").alias("__hi_i"),
        ).localCheckpoint(
            eager=True, storageLevel=CHECKPOINT_LEVEL
        )
        metrics_v = obs_v.get
        v_max = metrics_v["__m"]
        if v_max is None:  # empty side: match greatest(null, 1) = 1
            v_max = 0
        v = v.select(
            "i",
            F.expr(
                f"cast(cast(v as {_DEC}) * {_SCALE} "
                f"div greatest({v_max}, 1) as long)"
            ).alias("v"),
        )
    if not with_bounds:
        return u, v, r
    # i bounds straight from the final observation; v bounds are
    # analytic: raw v >= 0 (counts x non-negative factors), and the
    # max-normalization `v*SCALE div max(v)` sends the max to exactly
    # SCALE when positive (all-zero side stays 0)
    bounds = None
    if metrics_v is not None and metrics_v["__hi_i"] is not None:
        bounds = {
            "i": (int(metrics_v["__lo_i"]), int(metrics_v["__hi_i"])),
            "v": (0, _SCALE if v_max else 0),
        }
    return u, v, r, bounds


def als_rank1_exact(
    ratings: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "rating",
    iters: int = 3,
    top_k: int = 3,
) -> DataFrame:
    """Run the pinned fixed-point rank-1 fit and return the top-k
    UNSEEN items per user: ``(user, rec_rank, item, score)`` with
    ``score = u_i·v_j`` (exact integers)."""
    u, v, r, bounds = als_rank1_factors(
        ratings, user_col, item_col, rating_col, iters,
        with_bounds=True,
    )
    return topk_unseen_from_factors(u, v, r, top_k, bounds=bounds)


def topk_unseen_from_factors(
    u: DataFrame, v: DataFrame, r: DataFrame, top_k: int = 3,
    bounds: dict | None = None,
) -> DataFrame:
    """Exact top-k unseen items per user from rank-1 factor sides
    ``u(u, uf ≥ 0)``, ``v(i, v ≥ 0)`` and interactions ``r(u, i)`` —
    the bounded candidate prune, exposed so tests can drive it with
    hand-built tied factors (ADVICE r8)."""
    # Top-k unseen per user WITHOUT a users×items cross join: with a
    # rank-1 model the per-user item ordering (score desc, i) is the
    # GLOBAL ordering (v desc, i) whenever uf > 0, and plain (i) when
    # uf == 0 — so the exact top-k lives inside the first k + d_u items
    # of those two global rankings (a user skips at most its d_u seen
    # items).  Candidates = both prunes unioned: Σ(k + d_u) × 2 rows,
    # linear in |R|.  Both global ranks ride the range-partitioned
    # distributed_global_rank (no single-task window over the item
    # dim).
    from .ranking import distributed_global_rank

    # Rank order MUST be (v DESC, i ASC) — the per-user/oracle order.
    # With an (i DESC) tiebreak a v-tie group straddling the k + d_u
    # slot cutoff (near-certain at scale: v is quantized to ≤1001
    # values) would exclude the correct smallest-i unseen item from
    # by_v while by_i only covers globally-small ids (ADVICE r8).
    # ``bounds`` (round 16, VERDICT r15 #4, consumed only by the ALS
    # call sites): known (i, v) domain bounds — observed for free on
    # the fit's final checkpoint job — let both global ranks derive
    # their range-partition ids arithmetically instead of each paying
    # repartitionByRange's sampling pass per materialization.
    b_v = bounds.get("v") if bounds else None
    b_i = bounds.get("i") if bounds else None
    vr = distributed_global_rank(
        v, "v", ["i"], rank_col="rank_v", descending=True,
        tiebreak_descending=[False], bounds=b_v,
    )
    vr = distributed_global_rank(
        vr, "i", ["v"], rank_col="rank_i",  # i unique: tiebreak unused
        bounds=b_i,
    ).select("i", "v", "rank_v", "rank_i")
    # (measured: eagerly checkpointing vr here to dedupe the two
    # broadcasts costs MORE than the ≤|items|-row rank chain it saves —
    # scoring 29 jobs/3.0s with vs 24 jobs/2.5s without at sf0.1)
    seen = r.groupBy("u").agg(F.count(F.lit(1)).alias("d_u"))
    # explode each user to its candidate RANK SLOTS 1..k+d_u, then
    # equi-join the two global rankings — Σ(k+d_u) rows per ranking,
    # linear in |R|, hash-partitioned (a `rank <= cap` theta join would
    # compile to a BroadcastNestedLoopJoin scanning |U|·|I| pairs)
    slots = u.join(seen, "u").select(
        "u", "uf",
        F.explode(
            F.sequence(F.lit(1), F.col("d_u") + F.lit(top_k))
        ).alias("__slot"),
    )
    # the two prunes serve DISJOINT user sets: with uf > 0 the
    # per-user order IS the global (v desc, i asc) order → rank_v
    # covers; with uf == 0 every score ties at 0 and the order is
    # (i asc) → rank_i covers.  Splitting (instead of unioning a
    # superset over all users) keeps (u, i) unique by construction,
    # so no dropDuplicates shuffle is needed.
    by_v = slots.filter(F.col("uf") > 0).join(
        F.broadcast(vr.withColumnRenamed("rank_v", "__slot")).drop(
            "rank_i"
        ),
        "__slot",
    ).select("u", "uf", "i", "v")
    by_i = slots.filter(F.col("uf") == 0).join(
        F.broadcast(vr.withColumnRenamed("rank_i", "__slot")).drop(
            "rank_v"
        ),
        "__slot",
    ).select("u", "uf", "i", "v")
    cand = by_v.unionByName(by_i).join(
        r.select("u", "i"), ["u", "i"], "left_anti"
    )
    w = Window.partitionBy("u").orderBy(
        F.expr("uf * v").desc(), F.col("i")
    )
    return (
        cand.withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= top_k)
        .select(
            F.col("u").alias("user"),
            F.col("rec_rank").cast("long").alias("rec_rank"),
            F.col("i").alias("item"),
            F.expr("cast(uf * v as long)").alias("score"),
        )
    )


def als_rank1_oracle_sql(iters: int = 3, top_k: int = 3) -> str:
    """Unrolled DuckDB replay on the orders/lineitem interaction
    matrix (user = o_custkey, item = l_partkey, rating = basket
    count — the same matrix `als_recommendations` factorizes)."""
    parts = [f"""
    WITH r AS (
        SELECT o.o_custkey AS u, l.l_partkey AS i,
               count(*) AS rr
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    v0 AS (SELECT DISTINCT i, CAST({_SCALE} AS HUGEINT) AS v FROM r)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
    u{t}raw AS (
        SELECT r.u,
               sum(CAST(r.rr AS HUGEINT) * v.v) * {_SCALE}
                   // sum(v.v * v.v) AS uf
        FROM r JOIN v{t - 1} v USING (i) GROUP BY 1
    ),
    u{t} AS (
        SELECT u, uf * {_SCALE}
                  // greatest((SELECT max(uf) FROM u{t}raw), 1) AS uf
        FROM u{t}raw
    ),
    v{t}raw AS (
        SELECT r.i,
               sum(CAST(r.rr AS HUGEINT) * u.uf) * {_SCALE}
                   // sum(u.uf * u.uf) AS v
        FROM r JOIN u{t} u USING (u) GROUP BY 1
    ),
    v{t} AS (
        SELECT i, v * {_SCALE}
                  // greatest((SELECT max(v) FROM v{t}raw), 1) AS v
        FROM v{t}raw
    )""")
    parts.append(f""",
    cand AS (
        SELECT u.u, v.i, u.uf * v.v AS score
        FROM u{iters} u CROSS JOIN v{iters} v
        WHERE NOT EXISTS (
            SELECT 1 FROM r WHERE r.u = u.u AND r.i = v.i
        )
    ),
    ranked AS (
        SELECT u, i, score,
               row_number() OVER (
                   PARTITION BY u ORDER BY score DESC, i
               ) AS rec_rank
        FROM cand
    )
    SELECT u AS user, CAST(rec_rank AS BIGINT) AS rec_rank,
           i AS item, CAST(score AS BIGINT) AS score
    FROM ranked WHERE rec_rank <= {top_k}""")
    return "".join(parts)
