"""Set-similarity join with prefix filtering (PPJoin-family).

The dedup ladder's remaining classical pruning: for Jaccard threshold
``t``, order every document's distinct tokens by ascending global
document frequency (rarest first) and keep only the first
``p = n - ceil(t*n) + 1`` tokens as its PREFIX.  Two sets with
``J(A,B) >= t`` MUST share a prefix token (Chaudhuri et al. 2006
SSJoin; Xiao et al. 2008 PPJoin) — so the candidate join runs on
prefix tokens only, and rare-first ordering makes those join keys the
LOW-fanout ones.  Exact verification then computes integer Jaccard on
the candidates alone.

Spark shape, 100 TB-ready:

1. token df: one shuffle on token (partial-agg'd count);
2. prefix selection: window partitioned BY DOCUMENT (bounded rows per
   partition) ordered by (df, token) — no global rank table is ever
   materialized, the (df, token) pair itself is the order;
3. candidates: self-join on prefix token with ``id1 < id2``, pair
   dedup carrying two longs only;
4. verify: join the pair list back to full token sets, count common
   tokens, and decide with exact integer cross-multiplication
   (``common * 1e6 >= t_micros * (nA + nB - common)``) — no float
   thresholds, so the result is bit-stable cross-engine.

Work is proportional to the sum of squared prefix-token postings — the
frequent tokens that dominate fanout are exactly the ones prefix
selection excludes.  Contrast :mod:`.dedup` minhash (probabilistic,
fixed candidate budget) — prefix filtering is EXACT: no candidate with
``J >= t`` is ever lost, so the output equals the brute-force answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tokenize_distinct(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(doc_id, token)`` distinct pairs — lowercase whitespace tokens."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"[ \t\n\x0B\f\r]+")
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )


def prefix_filter_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold_micros: int = 700_000,
) -> DataFrame:
    """All pairs with exact Jaccard >= threshold:
    ``(doc1, doc2, common, union_sz, jaccard_micros)``.

    ``threshold_micros`` is the Jaccard threshold in exact micro-units
    (700_000 = 0.7); prefix length and the final test both use integer
    arithmetic only.
    """
    if not 0 < threshold_micros <= 1_000_000:
        raise ValueError("threshold_micros must be in (0, 1e6]")
    toks = tokenize_distinct(docs, id_col, text_col)
    df = toks.groupBy("token").agg(F.count("*").alias("df"))
    sized = toks.join(df, "token")
    n = Window.partitionBy("doc_id")
    order = Window.partitionBy("doc_id").orderBy("df", "token")
    with_prefix = sized.select(
        "doc_id",
        "token",
        F.count("*").over(n).alias("n"),
        F.row_number().over(order).alias("rk"),
    )
    # p = n - ceil(t*n) + 1, exact integer ceil
    prefix = with_prefix.where(
        F.col("rk")
        <= F.expr(
            f"n - ((n * {int(threshold_micros)} + 999999) div 1000000) + 1"
        )
    ).select("doc_id", "token", "n")

    a = prefix.select(
        F.col("doc_id").alias("doc1"), "token", F.col("n").alias("n1")
    )
    b = prefix.select(
        F.col("doc_id").alias("doc2"), "token", F.col("n").alias("n2")
    )
    cands = (
        a.join(b, "token")
        .where(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", "n1", "n2")
        .distinct()
    )
    # verification: count common tokens over the candidates only
    t1 = toks.select(F.col("doc_id").alias("doc1"), "token")
    t2 = toks.select(F.col("doc_id").alias("doc2"), "token")
    common = (
        cands.join(t1, "doc1")
        .join(t2, ["doc2", "token"])
        .groupBy("doc1", "doc2", "n1", "n2")
        .agg(F.count("*").alias("common"))
    )
    verified = common.select(
        "doc1",
        "doc2",
        F.col("common").cast("long").alias("common"),
        (F.col("n1") + F.col("n2") - F.col("common"))
        .cast("long")
        .alias("union_sz"),
    ).where(
        F.col("common") * F.lit(1_000_000)
        >= F.lit(int(threshold_micros)) * F.col("union_sz")
    )
    return verified.select(
        "doc1",
        "doc2",
        "common",
        "union_sz",
        F.expr("common * 1000000 div union_sz").alias("jaccard_micros"),
    )
