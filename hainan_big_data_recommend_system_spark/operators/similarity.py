"""Similarity joins (SURVEY.md §2.3 J5/J6, §2.9 M6§/M7§).

The reference computes cosine similarity two ways: an all-items top-k index
(`simility_books.py:62-63`, gensim ``Similarity(num_best=100)``) and
per-cluster dense indexes probed per event (`guessLike_u_like.py:88-90,
113-117`).  Its cluster blocking is a recall-trading scheme to avoid O(n²);
the Spark build keeps that idea as *data layout*: block → pair within block →
dot → window top-k.  All paths are pure DataFrame ops — no UDF in the pair
loop.

Three physical strategies, one semantic:

- :func:`cosine_topk_arrays` — exact, for dense ``array<float>`` embeddings,
  blocked by a column.  Dot products are **quantized**: each element is
  rounded to an integer grid once (``round(x * 10^q)``), so dots/norms are
  exact integer sums — deterministic under any evaluation order and engine
  (the float sum of a dot product is order-dependent; quantization is what
  makes the operator oracle-checkable AND retry-stable on a cluster).
- :func:`sparse_cosine_topk` — exact, for bag-of-words docs, via posting-list
  join: explode (doc, term, weight), equi-join on term, sum products.  This
  is the scalable sparse pattern — shuffle volume ∝ Σ df(term)², which
  ``max_df`` pruning bounds (ubiquitous terms carry no signal and quadratic
  cost; dropping them is the sparse analog of stop-words).
- LSH (`BucketedRandomProjectionLSH`/`MinHashLSH`, :mod:`.lsh`) — the
  approximate path when even blocked-exact is too big.

At 100 TB: block/bucket first, never crossJoin unblocked; the posting-list
join shuffles on term then on (a,b) pairs — both keys are
well-distributed after max_df pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def quantize_vec(vec: Column, scale: int = 1000) -> Column:
    """Per-element integer quantization of an ``array<numeric>`` column.

    Per-element rounding is order-independent, so downstream integer dot
    products are exact and engine/run deterministic.
    """
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors (bigint sums)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_topk_arrays(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    block_col: str | None = None,
    query_filter: Column | None = None,
    scale: int = 1000,
) -> DataFrame:
    """J5/J6: top-``k`` cosine neighbors per query vector, exact within blocks.

    ``block_col`` is the reference's cluster blocking (None → global, O(n²) —
    only for small n).  ``query_filter`` restricts the probe side (the online
    path probes single users; batch top-k probes every item).

    Returns ``(query_id, neighbor_id, sim)`` with ``sim`` the quantized
    cosine in [-1, 1], self-pairs excluded (P10 self-skip,
    `simility_books.py:79`).
    """
    q = df.select(
        F.col(id_col).alias("query_id"),
        quantize_vec(F.col(vec_col), scale).alias("__qv"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
    )
    if query_filter is not None:
        q = q.filter(query_filter)
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_vec(F.col(vec_col), scale).alias("__cv"),
        *( [F.col(block_col).alias("__cblk")] if block_col else [] ),
    )
    if block_col:
        pairs = q.join(c, (F.col("__blk") == F.col("__cblk")), "inner")
    else:
        pairs = q.crossJoin(c)
    pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))

    dot = int_dot(F.col("__qv"), F.col("__cv"))
    nq = int_dot(F.col("__qv"), F.col("__qv"))
    nc = int_dot(F.col("__cv"), F.col("__cv"))
    sim = (dot / (F.sqrt(nq.cast("double")) * F.sqrt(nc.cast("double")))).alias("sim")

    scored = pairs.select("query_id", "neighbor_id", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"),
                F.col("rn").cast("long").alias("rn"))
    )


def doc_token_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 0,
    max_df_frac: float | None = None,
) -> DataFrame:
    """M2§ as a relation: (doc_id, token, tf) with document-frequency pruning.

    ``min_df`` mirrors ``CountVectorizer(min_df)``; ``max_df_frac`` prunes
    ubiquitous terms — the knob that bounds the posting-join blowup at scale.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("__n"))
    pruned = df_counts.crossJoin(F.broadcast(n_docs)).filter(F.col("df") >= min_df)
    if max_df_frac is not None:
        pruned = pruned.filter(F.col("df") <= F.col("__n") * max_df_frac)
    return tf.join(F.broadcast(pruned.select("token")), "token", "inner").select(
        "doc_id", "token", "tf"
    )


def sparse_cosine_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_df: int = 0,
    max_df_frac: float | None = None,
    query_filter: Column | None = None,
) -> DataFrame:
    """J6/M7§: per-document top-``k`` cosine neighbors over bag-of-words
    vectors, via posting-list equi-join (no vector materialization).

    Integer tf counts → exact integer dots → deterministic ranking.
    """
    tw = doc_token_weights(docs, id_col, text_col, min_df, max_df_frac)
    norms = tw.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("norm2")
    )

    a = tw.select(
        F.col("doc_id").alias("a_id"), "token", F.col("tf").alias("a_tf")
    )
    if query_filter is not None:
        a = a.filter(query_filter)
    b = tw.select(
        F.col("doc_id").alias("b_id"), "token", F.col("tf").alias("b_tf")
    )
    dots = (
        a.join(b, "token", "inner")
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("a_tf") * F.col("b_tf")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("a_id"), F.col("norm2").alias("a_n2"))
    nb = norms.select(F.col("doc_id").alias("b_id"), F.col("norm2").alias("b_n2"))
    scored = (
        dots.join(na, "a_id")
        .join(nb, "b_id")
        .select(
            "a_id",
            "b_id",
            (
                F.col("dot")
                / (F.sqrt(F.col("a_n2").cast("double")) * F.sqrt(F.col("b_n2").cast("double")))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.asc("b_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("a_id").alias("query_id"),
            F.col("b_id").alias("neighbor_id"),
            F.round("sim", 6).alias("sim"),
            F.col("rn").cast("long").alias("rn"),
        )
    )
