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
    # hash BEFORE the distinct (r15, guide §2 — the same discipline as
    # dedup.hashed_shingles): the dedup shuffle then moves 16-byte
    # (doc_id, int64) rows instead of n-word strings.  Distinct-hash
    # counts equal distinct-string counts up to 64-bit collisions
    # (~|shingles|²/2⁶⁵), the same tolerance the hit join already has.
    corpus_sh = (
        shingles(corpus, id_col, text_col, n=n, distinct=False)
        .select("doc_id", F.xxhash64("shingle").alias("__sh"))
        .distinct()
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


def benchmark_overlap_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    m_bits: int = 1 << 23,
    k: int = 3,
) -> DataFrame:
    """Bloom-prefiltered decontamination — bit-identical output to
    :func:`benchmark_overlap`, different scale regime.

    The broadcast path above assumes the benchmark shingle set fits in a
    broadcast.  When it doesn't (many eval suites unioned, or bench-vs-
    bench sweeps), the corpus side must shuffle-join on the shingle key —
    and THAT is what a Bloom filter prevents: a fixed-size bitmap
    (``m_bits``/8 bytes, default 1 MiB) stands in for the whole benchmark
    set, the corpus stream is prefiltered scan-locally to the tiny
    bloom-passing fraction, and only those survivors enter the shuffle
    join for exact verification.  Bloom false positives are killed by the
    verify join; false negatives cannot exist (every benchmark position
    is set), so the result is exactly :func:`benchmark_overlap`'s — and
    shares its DuckDB oracle.

    Mechanics: ``k`` salted ``xxhash64`` positions per shingle; the
    benchmark's set-bit positions are collected (bounded by
    ``min(k·n_bench_shingles, m_bits)`` ints — the regime where even the
    position LIST is driver-hostile is the regime where you shard the
    filter, out of scope here) into an LSB-first numpy bitmap that ships
    to executors as a broadcast variable, probed by an Arrow-vectorized
    ``pandas_udf`` (three bit tests per shingle — exactly the work a JVM
    bloom probe would do, and the only Python in the pipeline).

    Scale shape: two map-only corpus scans (per-doc totals; probe), no
    corpus-wide shuffle — the exact-verify join moves bloom survivors
    only.  Intentionally NOT materialized between the two scans:
    recomputing a scan-local shingle explode is cheaper at 100 TB than
    checkpointing the full shingle stream.
    """
    import numpy as np
    import pandas as pd

    if m_bits < 8 or m_bits % 8:
        raise ValueError(f"m_bits must be a positive multiple of 8, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    spark = corpus.sparkSession

    bench_sh = (
        shingles(
            benchmark.select(F.lit(0).alias("__bid"), F.col(text_col)),
            "__bid",
            text_col,
            n=n,
            distinct=False,
        )
        .select("shingle")
        .distinct()
    )

    def _positions(col):
        return [
            F.pmod(
                F.xxhash64(F.concat(col, F.lit(f"\x1f{i}"))), F.lit(m_bits)
            ).alias(f"__p{i}")
            for i in range(k)
        ]

    pos_rows = (
        bench_sh.select(
            F.explode(F.array(*_positions(F.col("shingle")))).alias("p")
        )
        .distinct()
        .collect()
    )
    bitmap = np.zeros(m_bits >> 3, dtype=np.uint8)
    idx = np.array([r["p"] for r in pos_rows], dtype=np.int64)
    if idx.size:
        np.bitwise_or.at(bitmap, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    bc = spark.sparkContext.broadcast(bitmap.tobytes())

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint resolver can't evaluate function-local names
    def _bloom_bit(p):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        i = p.to_numpy(np.int64)
        return pd.Series(
            ((bm[i >> 3] >> (i & 7).astype(np.uint8)) & 1).astype(bool)
        )

    bloom_bit = F.pandas_udf(_bloom_bit, "boolean")

    corpus_sh = shingles(corpus, id_col, text_col, n=n, distinct=True)
    totals = corpus_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )

    probed = corpus_sh.select(
        "doc_id", "shingle", *_positions(F.col("shingle"))
    )
    cond = bloom_bit(F.col("__p0"))
    for i in range(1, k):
        cond = cond & bloom_bit(F.col(f"__p{i}"))
    candidates = probed.filter(cond).select(
        "doc_id", F.xxhash64("shingle").alias("__sh")
    )
    bench_hash = bench_sh.select(F.xxhash64("shingle").alias("__sh")).distinct()
    # deliberate shuffle join (no broadcast hint): this operator's regime
    # is the too-big-to-broadcast benchmark; survivors are the small side
    hits = (
        candidates.join(bench_hash, "__sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated"))
    )
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_contaminated"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination_bp",
            F.expr("n_contaminated * 10000L div n_shingles").cast("long"),
        )
    )
