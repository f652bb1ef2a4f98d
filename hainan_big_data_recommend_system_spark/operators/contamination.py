"""Benchmark decontamination and duplicated-n-gram coverage — corpus-hygiene
operators of a training-data pipeline (north-star extension; no reference
analogue — the closest survey items are the shingle machinery of
:mod:`.dedup`, which this module reuses).

Two standard signals:

- :func:`benchmark_overlap` — *decontamination*: for every corpus doc, the
  fraction of its distinct word n-grams that also occur anywhere in a
  held-out benchmark set (the GPT-3/PaLM-style n-gram collision test).
  Docs above a threshold are dropped before training so eval numbers stay
  honest.
- :func:`dup_ngram_coverage` — the *exact-substring-dedup* signal of
  Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
  Better"): per doc, the fraction of its n-gram positions covered by an
  n-gram that also appears in at least ``min_docs`` distinct documents.
  High coverage ⇒ boilerplate / template text.

Scale shapes (the part that matters at 100 TB):

- The benchmark set is *small by construction* (eval suites are KBs–MBs
  against a TB–PB corpus), so its distinct-shingle set is broadcast —
  the corpus-side scan never shuffles on the shingle key at all: one
  broadcast-hash-join + one partial-aggregated groupBy(doc_id).
- Duplicated-n-gram coverage is corpus-vs-corpus, so there is no small
  side: it shuffles occurrences on an 8-byte xxhash64 shingle key (never
  the strings), aggregates doc-frequency with map-side combine, and
  joins the ≥min_docs survivors back.  Shuffle ∝ total n-gram
  occurrences — linear in corpus tokens, the floor for this statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles


def benchmark_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-corpus-doc benchmark contamination.

    Returns (doc_id, n_shingles, n_contaminated, contamination_bp) where
    ``contamination_bp`` is basis points (×10⁴, integer division — exact
    cross-engine) of distinct ``n``-gram shingles that occur in
    ``benchmark``.  Docs shorter than ``n`` tokens have zero shingles and
    are absent from the output (nothing to decontaminate).

    ``benchmark`` may share the corpus schema; only ``text_col`` is read.
    Its distinct shingle set is broadcast — do NOT pass a benchmark side
    comparable in size to the corpus (that is :func:`dup_ngram_coverage`'s
    regime).
    """
    corpus_sh = shingles(corpus, id_col, text_col, n=n, distinct=True).select(
        "doc_id", F.xxhash64("shingle").alias("__sh")
    )
    bench_sh = (
        shingles(
            benchmark.select(
                F.lit(0).alias("__bid"), F.col(text_col)
            ),
            "__bid",
            text_col,
            n=n,
            distinct=False,
        )
        .select(F.xxhash64("shingle").alias("__sh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = corpus_sh.join(F.broadcast(bench_sh), "__sh", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
        .withColumn(
            # integer division, not round(float): bit-exact cross-engine
            "contamination_bp",
            F.expr("n_contaminated * 10000L div n_shingles").cast("long"),
        )
    )


def dup_ngram_coverage(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Per-doc duplicated-n-gram position coverage.

    Returns (doc_id, n_positions, dup_positions, dup_coverage_bp): of the
    doc's ``n``-gram *positions* (occurrences, not distinct shingles), how
    many are an n-gram that appears in ≥ ``min_docs`` distinct docs.
    Docs with fewer than ``n`` tokens have 0 positions and 0 coverage.
    """
    occ = shingles(docs, id_col, text_col, n=n, distinct=False).select(
        "doc_id", F.xxhash64("shingle").alias("__sh")
    )
    # doc-frequency per shingle: distinct first so count(*) = distinct docs;
    # both aggregations partial-combine map-side
    dup_set = (
        occ.distinct()
        .groupBy("__sh")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("__sh", F.lit(1).alias("__dup"))
    )
    joined = occ.join(dup_set, "__sh", "left")
    counted = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_positions"),
        F.sum(F.coalesce(F.col("__dup"), F.lit(0)))
        .cast("long")
        .alias("dup_positions"),
    )
    # docs too short for any n-gram still get a row (0 positions)
    all_ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return (
        all_ids.join(counted, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_positions", F.lit(0)).cast("long").alias("n_positions"),
            F.coalesce("dup_positions", F.lit(0))
            .cast("long")
            .alias("dup_positions"),
            F.when(F.coalesce(F.col("n_positions"), F.lit(0)) == 0, F.lit(0))
            .otherwise(F.expr("dup_positions * 10000L div n_positions"))
            .cast("long")
            .alias("dup_coverage_bp"),
        )
    )
