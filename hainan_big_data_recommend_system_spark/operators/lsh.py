"""Random-hyperplane LSH ANN — the bucket-join scale path for cosine
similarity search (BASELINE.json north_star: "similarity search").

Sign-random-projection LSH (Charikar, STOC'02): a vector's signature in
table ``t`` is the bit-pattern of ``sign(v · h_tj)`` over ``bits``
hyperplanes; vectors colliding in any table's bucket become candidate
pairs, scored exactly within the bucket.  P[bit match] = 1 − θ/π, so
near-parallel vectors collide in some table with high probability while
the corpus-wide pair space is never enumerated.

Complements the other ANN strategies (operators/ann.py): IVF partitions by
trained centroids (data-dependent, needs an offline fit); hyperplane LSH
is data-INDEPENDENT — no training stage, signatures are pure per-row map
work, which makes it the right first index for a corpus you haven't
sampled yet and the only one that works under adversarial drift.

Determinism: hyperplane components are pinned integers from a fixed LCG
formula (:func:`pinned_hyperplanes`) and vectors are integer-quantized
(:func:`..similarity.quantize_vec`), so bucket ids and scores are exact —
the whole query (signature, bucket join, scoring) is DuckDB-oracle-
checkable, same design as the pinned IVF quantizer
(operators/ivf_centroids.py) and the MinHash hash family
(operators/dedup.py).

100 TB shape: signatures are one map pass (shuffle = |rows|·tables for
the groupBy); the bucket self-join shuffles on (table, bucket) — bucket
population is the work unit, tuned by ``bits`` (more bits → smaller
buckets → fewer candidates, lower recall; more tables buys recall back
linearly in signature cost).  Nothing is all-pairs: work ∝ Σ bucket².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .similarity import int_dot, quantize_vec

#: LCG constants (glibc's) for the pinned hyperplane family — any fixed
#: odd multiplier works; pinned so Spark and the SQL oracle embed the
#: same literals.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2003  # prime → components uniform in [-1001, 1001]


def pinned_hyperplanes(
    n_tables: int = 4, bits: int = 6, dim: int = 64
) -> list[tuple[int, int, list[int]]]:
    """Deterministic integer hyperplanes, ``(table, bit, components)`` rows.

    Component ``d`` of hyperplane ``(t, j)`` is
    ``((A·(idx+1) + C) mod M) − (M−1)/2`` with
    ``idx = (t·bits + j)·dim + d`` — a data-independent pseudo-random
    family symmetric around 0, reproducible as literals in oracle SQL.
    """
    planes = []
    half = (_LCG_M - 1) // 2
    for t in range(n_tables):
        for j in range(bits):
            base = (t * bits + j) * dim
            h = [
                ((_LCG_A * (base + d + 1) + _LCG_C) % _LCG_M) - half
                for d in range(dim)
            ]
            planes.append((t, j, h))
    return planes


def lsh_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[tuple[int, int, list[int]]] | None = None,
    scale: int = 1000,
) -> DataFrame:
    """Per-(vector, table) bucket ids: ``(vid, __qv, t, bucket)``.

    ``bucket = Σ_j [v·h_tj ≥ 0] · 2^j`` over exact integer dots.
    Physically: broadcast of ``tables·bits`` hyperplane rows, a map-side
    crossJoin computing one dot per (row, plane), then a groupBy packing
    bits — shuffle volume = |rows|·tables signature rows, never vectors
    squared.
    """
    if planes is None:
        planes = pinned_hyperplanes()
    spark = df.sparkSession
    plane_df = F.broadcast(
        spark.createDataFrame(planes, "t int, j int, h array<bigint>")
    )
    base = df.select(
        F.col(id_col).alias("vid"),
        quantize_vec(F.col(vec_col), scale).alias("__qv"),
    )
    bit = F.when(int_dot(F.col("__qv"), F.col("h")) >= 0, 1).otherwise(0)
    return (
        base.crossJoin(plane_df)
        .select("vid", "__qv", "t", "j", bit.alias("__bit"))
        .groupBy("vid", "t")
        .agg(
            F.sum(F.expr("shiftleft(__bit, j)")).alias("bucket"),
            F.first("__qv").alias("__qv"),
        )
    )


def lsh_topk_pinned(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_tables: int = 4,
    bits: int = 6,
    query_filter: Column | None = None,
    scale: int = 1000,
) -> DataFrame:
    """Top-k cosine neighbors via hyperplane-LSH bucket join —
    ``(query_id, neighbor_id, sim, rn)``, self-pairs excluded.

    Candidates = pairs sharing any table's bucket, deduplicated across
    tables BEFORE scoring (a pair colliding in 3 of 4 tables is scored
    once); scores are exact integer-quantized cosine, so recall loss comes
    only from bucketing, never score noise.  ``query_filter`` bounds the
    query side (applied to ``query_id``) the way the reference's online
    path scores one probe set per event.
    """
    planes = pinned_hyperplanes(n_tables, bits, _vec_dim(df, vec_col))
    sig = lsh_signatures(df, id_col, vec_col, planes, scale)
    a = sig.select(
        F.col("vid").alias("query_id"), F.col("__qv").alias("__qa"), "t", "bucket"
    )
    if query_filter is not None:
        a = a.filter(query_filter)
    b = sig.select(
        F.col("vid").alias("neighbor_id"), F.col("__qv").alias("__qb"), "t", "bucket"
    )
    pairs = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dot = int_dot(F.col("__qa"), F.col("__qb")).cast("double")
    na = int_dot(F.col("__qa"), F.col("__qa")).cast("double")
    nb = int_dot(F.col("__qb"), F.col("__qb")).cast("double")
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (dot / (F.sqrt(na) * F.sqrt(nb))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 6).alias("sim"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from one row (embedding columns are fixed-dim
    by contract; one-row limit, not a full scan)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not row:
        raise ValueError(f"cannot infer dim of {vec_col!r}: empty input")
    return int(row[0]["d"])
