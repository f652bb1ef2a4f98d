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

Two further LOSSLESS prunings (both leave the output bit-identical —
the unit suite pins equality with brute force):

- **length filter** (PPJoin): ``J >= t`` implies
  ``min(n1,n2) >= t·max(n1,n2)``, checked by integer
  cross-multiplication inside the candidate join;
- **exact-duplicate collapse**: identical token SETS are the dominant
  duplication mode in real corpora (mirrors, reposts — and 21% of the
  synthetic fixture).  Docs are grouped by an md5 over their sorted
  token list; the similarity join runs on one REPRESENTATIVE per
  group, then pairs expand back — intra-group pairs are J = 1.0 by
  construction, inter-group pairs inherit the representatives'
  statistics (identical sets ⇒ identical Jaccard).  On a corpus with
  duplication factor d this cuts the quadratic candidate/verify work
  by d² and pays only output-linear expansion — the difference between
  O((dn)²) and O(n²) + O(|output|) when a crawl is re-ingested.

Spark shape, 100 TB-ready:

1. token df: one shuffle on token (partial-agg'd count);
2. prefix selection: window partitioned BY DOCUMENT (bounded rows per
   partition) ordered by (df, token) — no global rank table is ever
   materialized, the (df, token) pair itself is the order;
3. candidates: self-join on prefix token with ``id1 < id2`` and the
   length filter, pair dedup carrying two longs only;
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

from ..session import CHECKPOINT_LEVEL


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


def _verified_pairs(toks: DataFrame, threshold_micros: int) -> DataFrame:
    """Prefix-filtered, length-filtered, exactly-verified pairs over a
    ``(doc_id, token)`` relation: ``(doc1, doc2, common, union_sz)``."""
    t = int(threshold_micros)
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
        <= F.expr(f"n - ((n * {t} + 999999) div 1000000) + 1")
    ).select("doc_id", "token", "n")

    a = prefix.select(
        F.col("doc_id").alias("doc1"), "token", F.col("n").alias("n1")
    )
    b = prefix.select(
        F.col("doc_id").alias("doc2"), "token", F.col("n").alias("n2")
    )
    cands = (
        a.join(b, "token")
        .where(
            (F.col("doc1") < F.col("doc2"))
            # length filter: J >= t forces min(n1,n2) >= t*max(n1,n2)
            & (F.col("n1") * F.lit(1_000_000) >= F.lit(t) * F.col("n2"))
            & (F.col("n2") * F.lit(1_000_000) >= F.lit(t) * F.col("n1"))
        )
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
    return common.select(
        "doc1",
        "doc2",
        F.col("common").cast("long").alias("common"),
        (F.col("n1") + F.col("n2") - F.col("common"))
        .cast("long")
        .alias("union_sz"),
    ).where(
        F.col("common") * F.lit(1_000_000)
        >= F.lit(t) * F.col("union_sz")
    )


def prefix_filter_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold_micros: int = 700_000,
    collapse_exact: bool = True,
) -> DataFrame:
    """All pairs with exact Jaccard >= threshold:
    ``(doc1, doc2, common, union_sz, jaccard_micros)``.

    ``threshold_micros`` is the Jaccard threshold in exact micro-units
    (700_000 = 0.7); prefix length and the final test both use integer
    arithmetic only.  ``collapse_exact`` (default) runs the join on one
    representative per identical token set and expands pairs back —
    lossless (identical sets have identical Jaccard to everything), and
    quadratically cheaper on duplication-heavy corpora.
    """
    if not 0 < threshold_micros <= 1_000_000:
        raise ValueError("threshold_micros must be in (0, 1e6]")
    # materialize the token relation once (round 16, guide §2.4): the
    # df-count, prefix, exact-signature and BOTH verification sides all
    # consume it — without this the explode+distinct shuffle re-executes
    # per reference (the subplans differ by alias, so ReuseExchange
    # cannot kick in).  Narrow (doc_id, token) rows; serialized blocks.
    toks = tokenize_distinct(docs, id_col, text_col).localCheckpoint(
        eager=True, storageLevel=CHECKPOINT_LEVEL
    )

    if not collapse_exact:
        pairs = _verified_pairs(toks, threshold_micros)
    else:
        sig = toks.groupBy("doc_id").agg(
            F.md5(
                F.concat_ws(
                    "\x01", F.sort_array(F.collect_list("token"))
                )
            ).alias("__sig"),
            F.count("*").alias("__n"),
        )
        # one row per doc, consumed by the rep semi-join, intra pairs
        # (twice) and inter expansion (twice) — same reuse argument
        members = sig.join(
            sig.groupBy("__sig").agg(F.min("doc_id").alias("__rep")),
            "__sig",
        ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
        rep_toks = toks.join(
            members.where(F.col("doc_id") == F.col("__rep")).select(
                "doc_id"
            ),
            "doc_id",
            "left_semi",
        )
        rep_pairs = _verified_pairs(rep_toks, threshold_micros)
        # intra-group: identical sets, J = 1.0 by construction
        intra = (
            members.select(
                "__sig",
                F.col("doc_id").alias("doc1"),
                F.col("__n").alias("common"),
            )
            .join(
                members.select(
                    "__sig", F.col("doc_id").alias("doc2")
                ),
                "__sig",
            )
            .where(F.col("doc1") < F.col("doc2"))
            .select(
                "doc1",
                "doc2",
                F.col("common").cast("long").alias("common"),
                F.col("common").cast("long").alias("union_sz"),
            )
        )
        # inter-group: every member pair inherits the reps' statistics
        inter = (
            rep_pairs.join(
                members.select(
                    F.col("__rep").alias("doc1"),
                    F.col("doc_id").alias("__a"),
                ),
                "doc1",
            )
            .join(
                members.select(
                    F.col("__rep").alias("doc2"),
                    F.col("doc_id").alias("__b"),
                ),
                "doc2",
            )
            .select(
                F.least("__a", "__b").alias("doc1"),
                F.greatest("__a", "__b").alias("doc2"),
                "common",
                "union_sz",
            )
        )
        pairs = inter.unionByName(intra)

    return pairs.select(
        "doc1",
        "doc2",
        "common",
        "union_sz",
        F.expr("common * 1000000 div union_sz").alias("jaccard_micros"),
    )
