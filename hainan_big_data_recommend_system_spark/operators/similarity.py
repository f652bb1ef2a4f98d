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
from ..session import CHECKPOINT_LEVEL


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

    Physical strategy: the per-pair dot products run as a **blocked numpy
    int64 matmul** inside ``applyInPandas`` (one group per block) — exact
    integer math, so results are bit-identical to the expression-level
    pair join, but the inner loop is vectorized C instead of per-element
    interpreted higher-order functions.  Each block must fit one executor
    (that is the contract of blocking; at 100 TB the block is the unit of
    ANN partitioning — cap block sizes upstream with finer clustering).

    Returns ``(query_id, neighbor_id, sim, rn)`` with ``sim`` the quantized
    cosine in [-1, 1], self-pairs excluded (P10 self-skip,
    `simility_books.py:79`).
    """
    import pandas as pd

    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"),
        quantize_vec(F.col(vec_col), scale).alias("__qv"),
        (F.col(block_col) if block_col else F.lit(0)).alias("__blk"),
        (
            query_filter if query_filter is not None else F.lit(True)
        ).alias("__is_query"),
    )

    out_schema = (
        "query_id long, neighbor_id long, sim double"
    )

    def _block_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        vecs = np.array(pdf["__qv"].tolist(), dtype=np.int64)
        ids = pdf["query_id"].to_numpy()
        qmask = pdf["__is_query"].to_numpy(dtype=bool)
        if vecs.size == 0 or not qmask.any():
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "sim": []}
            )
        norms = np.sqrt((vecs * vecs).sum(axis=1).astype(np.float64))
        # zero-norm vectors have no defined cosine — exclude as queries
        # AND candidates (0/0 = NaN would rank first under F.desc)
        qi = np.nonzero(qmask & (norms > 0))[0]
        if len(qi) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "sim": []})
        dots = vecs[qi] @ vecs.T  # exact int64
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = dots / (norms[qi][:, None] * norms[None, :])
        rows_q, rows_n, rows_s = [], [], []
        for r, i in enumerate(qi):
            srow = sims[r]
            cand = np.nonzero((ids != ids[i]) & (norms > 0))[0]
            # sort: sim desc, neighbor_id asc (lexsort: last key is primary)
            order = cand[np.lexsort((ids[cand], -srow[cand]))][:k]
            rows_q.extend([ids[i]] * len(order))
            rows_n.extend(ids[order])
            rows_s.extend(srow[order])
        return pd.DataFrame(
            {"query_id": rows_q, "neighbor_id": rows_n, "sim": rows_s}
        )

    scored = base.groupBy("__blk").applyInPandas(_block_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"),
                F.col("rn").cast("long").alias("rn"))
    )


def blocked_cosine_pairs_np(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
    scale: int = 1000,
) -> DataFrame:
    """All within-block pairs (a_id < b_id) with quantized cosine ≥ threshold.

    Same exact-integer semantics as a pair join with :func:`int_dot`, executed
    as one numpy int64 matmul per block (embedding near-dup detection)."""
    import pandas as pd

    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("a_id"),
        quantize_vec(F.col(vec_col), scale).alias("__qv"),
        F.col(block_col).alias("__blk"),
    )

    def _block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        vecs = np.array(pdf["__qv"].tolist(), dtype=np.int64)
        ids = pdf["a_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "sim": []})
        order = np.argsort(ids, kind="stable")
        vecs, ids = vecs[order], ids[order]
        norms = np.sqrt((vecs * vecs).sum(axis=1).astype(np.float64))
        nz = norms > 0  # zero-norm vectors pair with nothing
        vecs, ids, norms = vecs[nz], ids[nz], norms[nz]
        if len(ids) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "sim": []})
        sims = (vecs @ vecs.T) / (norms[:, None] * norms[None, :])
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        return pd.DataFrame(
            {"a_id": ids[iu[keep]], "b_id": ids[ju[keep]],
             "sim": sims[iu[keep], ju[keep]]}
        )

    return base.groupBy("__blk").applyInPandas(
        _block_pairs, "a_id long, b_id long, sim double"
    ).select("a_id", "b_id", F.round("sim", 6).alias("sim"))


def _term_freqs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, token, tf) term frequencies via whitespace tokenization."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")).alias("token"),
    ).filter(F.col("token") != "")
    return toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))


def _kept_vocab(
    docs: DataFrame,
    tf: DataFrame,
    id_col: str,
    min_df: int,
    max_df_frac: float | None,
) -> DataFrame:
    """Tokens surviving document-frequency pruning (one row per token)."""
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    pruned = df_counts.filter(F.col("df") >= min_df)
    if max_df_frac is not None:
        n_docs = docs.select(F.countDistinct(id_col).alias("__n"))
        pruned = pruned.crossJoin(F.broadcast(n_docs)).filter(
            F.col("df") <= F.col("__n") * max_df_frac
        )
    return pruned.select("token")


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
    tf = _term_freqs(docs, id_col, text_col)
    kept = _kept_vocab(docs, tf, id_col, min_df, max_df_frac)
    return tf.join(F.broadcast(kept), "token", "inner").select(
        "doc_id", "token", "tf"
    )


def tfidf_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 0,
) -> DataFrame:
    """TF-IDF term weighting as a relation:
    ``(doc_id, token, tf, df, idf_micros, w)`` with
    ``idf_micros = round(ln((N+1)/(df+1))·10⁶)`` and ``w = tf · idf_micros``.

    The idf is quantized to integer micros immediately — downstream dot
    products over ``w`` stay exact integer sums (same discipline as
    :func:`quantize_vec`).  N comes from a scalar subquery, not a driver
    constant, so the plan stays self-contained at any scale.
    """
    tf = _term_freqs(docs, id_col, text_col)
    dfc = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if min_df:
        dfc = dfc.filter(F.col("df") >= min_df)
    n_docs = docs.select(F.countDistinct(id_col).alias("__n"))
    idf = F.round(
        F.log((F.col("__n") + 1) / (F.col("df") + 1)) * 1_000_000
    ).cast("bigint")
    weighted_vocab = (
        dfc.crossJoin(F.broadcast(n_docs))
        .select("token", "df", idf.alias("idf_micros"))
    )
    return tf.join(F.broadcast(weighted_vocab), "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        "idf_micros",
        (F.col("tf") * F.col("idf_micros")).alias("w"),
    )


def sparse_cosine_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_df: int = 0,
    max_df_frac: float | None = None,
    query_filter: Column | None = None,
    dense_max_vocab: int = 4096,
) -> DataFrame:
    """J6/M7§: per-document top-``k`` cosine neighbors over bag-of-words
    vectors.  Integer tf counts → exact integer dots → deterministic ranking.

    **Adaptive physical strategy** (library-level analog of AQE: look at a
    runtime statistic, then pick the plan):

    - pruned vocabulary ≤ ``dense_max_vocab`` → **blocked dense matmul**:
      docs become dense int64 vectors; candidates are hash-partitioned into
      one block per core, queries are replicated to every block, and each
      block computes a numpy ``Q @ Cᵀ`` with local top-k.  A posting join
      here would explode (shuffle ∝ Σ df(term)², and a tiny vocab means
      every term is ubiquitous — at sf0.1 the 31-term vocab yields a 44M-row
      join intermediate; the dense path is ~10× faster).
    - otherwise → **posting-list equi-join** on hashed term ids: shuffle
      ∝ Σ df(term)², which ``max_df`` pruning bounds.  This is the sparse
      scale path — no vector wider than a doc's own terms materializes.

    Both paths produce bit-identical results (exact integer dots, same
    float64 norm/divide, same tie-breaks), so the choice is purely physical.
    """
    tf = _term_freqs(docs, id_col, text_col)
    kept = _kept_vocab(docs, tf, id_col, min_df, max_df_frac)
    vocab_sample = kept.limit(dense_max_vocab + 1).collect()
    if len(vocab_sample) <= dense_max_vocab:
        tokens = sorted(r[0] for r in vocab_sample)
        scored = _dense_blocked_scores(docs, id_col, text_col, tokens, k, query_filter)
    else:
        # eager localCheckpoint, not persist (lazy would recompute per path): the weighted postings feed the
        # norm aggregate and both join sides; checkpoint blocks are
        # GC-reclaimed after the query instead of living in the CacheManager
        # forever.  (Non-replicated + lineage cut → executor loss fails the
        # job; at cluster scale stage this table reliably instead.)
        tw = tf.join(F.broadcast(kept), "token", "inner").localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
        scored = _posting_join_scores(tw, query_filter)
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


def _posting_join_scores(tw: DataFrame, query_filter: Column | None) -> DataFrame:
    """Pairwise cosine via posting-list join on hashed term ids (the 8-byte
    key beats strings in shuffle/compare; 64-bit collisions are immaterial)."""
    twh = tw.select("doc_id", F.xxhash64("token").alias("__tok"), "tf")
    norms = twh.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("norm2")
    )
    a = twh.select(
        F.col("doc_id").alias("a_id"), "__tok", F.col("tf").alias("a_tf")
    )
    if query_filter is not None:
        a = a.filter(query_filter)
    b = twh.select(
        F.col("doc_id").alias("b_id"), "__tok", F.col("tf").alias("b_tf")
    )
    dots = (
        a.join(b, "__tok", "inner")
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("a_tf") * F.col("b_tf")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("a_id"), F.col("norm2").alias("a_n2"))
    nb = norms.select(F.col("doc_id").alias("b_id"), F.col("norm2").alias("b_n2"))
    return (
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


def _dense_blocked_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    tokens: list[str],
    k: int,
    query_filter: Column | None,
    docs_per_block: int = 4000,
) -> DataFrame:
    """Single-pass dense scoring straight from text: candidates are
    hash-partitioned into ~``docs_per_block``-doc blocks, queries replicated
    to every block, and each block tokenizes + vectorizes + matmuls in one
    ``applyInPandas`` (numpy int64 ``Q @ Cᵀ``) with a local top-k.  The
    global window top-k over the union of per-block top-k is exact.

    Tokenization inside the block replicates the engine-wide explicit
    whitespace class (``[ \\t\\n\\x0B\\f\\r]+`` — Java's ASCII ``\\s`` set,
    spelled out so RE2/DuckDB agree byte-for-byte) — per-(doc, kept-token)
    counts, hence dots and norms, are identical to the posting-join path.
    """
    import pandas as pd

    spark = docs.sparkSession
    # block count from the table's row estimate — one cheap metadata-only
    # count (parquet row groups), no full pass
    n_docs = docs.count()
    n_blocks = max(1, -(-n_docs // docs_per_block))
    vocab_index = {t: i for i, t in enumerate(tokens)}
    vocab_size = len(tokens)
    vocab_bc = spark.sparkContext.broadcast(vocab_index)

    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
    cand = base.select(
        "doc_id",
        "__text",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_blocks)).cast("int").alias("__blk"),
        F.lit(False).alias("__q"),
    )
    q = base.withColumnRenamed("doc_id", "a_id")
    if query_filter is not None:
        q = q.filter(query_filter)
    blocks = spark.range(n_blocks).select(F.col("id").cast("int").alias("__blk"))
    qrep = q.crossJoin(blocks).select(
        F.col("a_id").alias("doc_id"), "__text", "__blk", F.lit(True).alias("__q")
    )

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        import re

        import numpy as np

        # the engine-wide explicit ASCII whitespace class (see module
        # docstring of the split sweep) — NOT Python's unicode \s
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        vocab = vocab_bc.value

        def vectorize(rows: pd.DataFrame) -> tuple:
            mat = np.zeros((len(rows), vocab_size), dtype=np.int64)
            for r, text in enumerate(rows["__text"]):
                if text is None:
                    continue  # posting path drops NULL docs; match it
                # strip ASCII space ONLY — F.trim's semantics; Python's
                # bare strip() removes unicode whitespace and would make
                # the two physical strategies tokenize differently
                for tok in ws.split(text.strip(" ")):
                    i = vocab.get(tok)
                    if i is not None:
                        mat[r, i] += 1
            return rows["doc_id"].to_numpy(), mat

        is_q = pdf["__q"].to_numpy(dtype=bool)
        if is_q.all() or not is_q.any():
            return pd.DataFrame({"a_id": [], "b_id": [], "sim": []})
        c_ids, c_mat = vectorize(pdf[~is_q])
        q_ids, q_mat = vectorize(pdf[is_q])
        c_norm = np.sqrt((c_mat * c_mat).sum(axis=1).astype(np.float64))
        q_norm = np.sqrt((q_mat * q_mat).sum(axis=1).astype(np.float64))
        dots = q_mat @ c_mat.T  # exact int64
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = dots / (q_norm[:, None] * c_norm[None, :])
        rows_a, rows_b, rows_s = [], [], []
        for r in range(len(q_ids)):
            # dot == 0 ⟺ no shared term: the posting join never emits such
            # pairs, so the dense path must drop them too (exact parity)
            cand_idx = np.nonzero((c_ids != q_ids[r]) & (dots[r] > 0))[0]
            srow = sims[r]
            top = cand_idx[np.lexsort((c_ids[cand_idx], -srow[cand_idx]))][:k]
            rows_a.extend([q_ids[r]] * len(top))
            rows_b.extend(c_ids[top])
            rows_s.extend(srow[top])
        return pd.DataFrame({"a_id": rows_a, "b_id": rows_b, "sim": rows_s})

    return cand.unionByName(qrep).groupBy("__blk").applyInPandas(
        _block, "a_id long, b_id long, sim double"
    )
