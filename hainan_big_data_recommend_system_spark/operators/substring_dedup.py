"""Exact-substring span removal — the within/cross-document repeated-span
scrub of Lee et al. 2021 ("Deduplicating Training Data Makes Language
Models Better"), token-window formulation.

Their suffix-array pass removes every repeated ≥50-char span from all but
one occurrence; the distributed approximation here hashes every ``w``-token
window, keeps the corpus-wide FIRST occurrence (smallest ``(doc_id, pos)``)
of each duplicated window, and deletes every token covered by any other
occurrence.  Exact duplicate documents lose their entire text (the window
union covers them); shared boilerplate sentences are stripped from every
doc but the first — the two failure modes document-level dedup cannot
reach.

Pipeline shape (everything engine-native, no UDF):

1. window hashes via slice + concat — one pass, positions ride along;
2. duplicate marking = ONE window shuffle keyed on the 8-byte hash
   (``row_number`` for the canonical first + ``count`` in the same
   partition spec, so one Exchange serves both);
3. interval merge per doc = gaps-and-islands over ``(doc, pos)`` (the
   running-max-end trick), merging overlapping remove-spans;
4. rebuild = positional anti containment join + order-disciplined
   ``collect_list``.

At 100 TB the wide stages shuffle only ``(doc_id, pos, hash)`` triples —
never text — and the per-doc stages are bounded by document length.  The
window hash differs per engine (Spark ``xxhash64`` vs oracle ``md5``) but
only equality classes matter, so results still hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_WS = r"[ \t\n\x0B\f\r]+"


def exact_substring_dedup(
    docs: DataFrame, id_col: str, text_col: str, w: int = 8
) -> DataFrame:
    """``(doc_id, clean_text, n_tokens, n_removed_tokens)`` after removing
    every duplicated ``w``-token window occurrence except the corpus-wide
    first (ties impossible: ``(doc_id, pos)`` is unique)."""
    if w < 2:
        raise ValueError(
            f"window length w={w} must be >= 2: w=1 degenerates into "
            "removing every repeated TOKEN, which is not span removal"
        )
    # empty tokens filtered like the sibling operators (cdc_chunk_stats,
    # bigram_lm_scores): an empty doc must report 0 tokens, not a phantom
    # ''-token that skews removal-rate statistics
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), _WS), lambda w: w != ""
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    # guard: Spark's sequence DESCENDS when stop < start — short docs must
    # yield zero windows (same guard as operators/dedup.shingles)
    idx = F.when(
        F.size("__toks") >= w, F.sequence(F.lit(1), F.size("__toks") - (w - 1))
    ).otherwise(F.array().cast("array<int>"))
    occ = base.select(
        "doc_id", F.explode(idx).alias("pos"), "__toks"
    ).select(
        "doc_id",
        "pos",
        F.xxhash64(F.concat_ws(" ", F.slice("__toks", F.col("pos"), w))).alias(
            "__wh"
        ),
    )
    wh = Window.partitionBy("__wh")
    ranked = occ.select(
        "doc_id",
        "pos",
        F.row_number().over(wh.orderBy("doc_id", "pos")).alias("__rn"),
        F.count(F.lit(1)).over(wh).alias("__cnt"),
    )
    remove = ranked.filter((F.col("__cnt") >= 2) & (F.col("__rn") >= 2)).select(
        "doc_id", "pos", (F.col("pos") + (w - 1)).alias("__end")
    )
    # gaps-and-islands interval merge: new island when this span starts
    # past the running max end of everything before it
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("__end").over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    merged = (
        remove.select(
            "doc_id",
            "pos",
            "__end",
            F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
            .otherwise(0)
            .alias("__ni"),
        )
        .select(
            "doc_id",
            "pos",
            "__end",
            F.sum("__ni")
            .over(wdoc.rowsBetween(Window.unboundedPreceding, 0))
            .alias("__g"),
        )
        .groupBy("doc_id", "__g")
        .agg(F.min("pos").alias("__s"), F.max("__end").alias("__e"))
    )
    tokens = base.select(
        "doc_id",
        F.posexplode("__toks").alias("__p0", "__tok"),
    ).select("doc_id", (F.col("__p0") + 1).alias("pos"), "__tok")
    # aliased join keys: tokens and merged share lineage (both derive from
    # base), and accessor-resolved doc_id == doc_id would be the ambiguous
    # self-join case — explicit renames make the containment join sound
    spans = merged.select(
        F.col("doc_id").alias("__mdoc"), "__s", "__e"
    )
    kept = tokens.join(
        spans,
        (F.col("doc_id") == F.col("__mdoc"))
        & (F.col("pos") >= F.col("__s"))
        & (F.col("pos") <= F.col("__e")),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "__tok"))),
                lambda s: s["__tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__kc"),
    )
    all_docs = base.select("doc_id", F.size("__toks").alias("__nt_all"))
    return all_docs.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.col("__nt_all").cast("long").alias("n_tokens"),
        (F.col("__nt_all") - F.coalesce("__kc", F.lit(0)))
        .cast("long")
        .alias("n_removed_tokens"),
    )
