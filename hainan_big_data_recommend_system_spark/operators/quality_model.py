"""Hashed-feature linear quality classifier — model INFERENCE as a query.

The fastText-role stage of a corpus pipeline: a trained linear model over
hashed bag-of-words features scores every document, and a threshold
decides keep/drop (the CCNet/GPT-3 quality-filter pattern — complement to
:mod:`..qcatalog.textstats`' heuristic scores and the self-trained
unigram LM).  Training happens offline; what the engine must do at
100 TB is *apply* the model, and that is a broadcast join:

    tokens → feature bucket (hash mod B) → join the B-row weight table
    → per-doc integer aggregate → threshold.

Scale shape: scan-local tokenize/hash, one broadcast-hash-join against a
weight table of B rows (any real model's hashed feature table is MBs),
one map-side-combined groupBy(doc_id).  No Python anywhere.

Determinism: weights are pinned integers (SplitMix64 of the bucket
index, the same construction as the LSH hyperplanes), buckets come from
the first 7 hex chars of md5 (bit-identical in Spark and DuckDB — the
oracle inlines the weight table as a VALUES literal), and the score is
an integer mean (``sum div count`` over nonnegative weights — weights
are kept nonnegative because Spark's ``div`` truncates toward zero
while DuckDB's ``//`` floors, which diverges on negatives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .lsh import _mix64

#: Feature-space size.  Real deployments use 2^18–2^21; the pinned demo
#: model uses 256 so the oracle's VALUES literal stays readable.
N_BUCKETS = 256

#: Keep threshold: mean feature weight in milli-units; pinned weights are
#: uniform on [0, 1000], so 500 is the model's decision midpoint.
KEEP_MILLI = 500


def pinned_weights(n_buckets: int = N_BUCKETS) -> list[tuple[int, int]]:
    """``(bucket, weight_milli)`` rows, weight = mix64(j+1) mod 1001 —
    iid-looking, nonnegative, reproducible as SQL literals."""
    return [(j, _mix64(j + 1) % 1001) for j in range(n_buckets)]


def weights_values_sql(n_buckets: int = N_BUCKETS) -> str:
    """The weight table as a SQL VALUES literal (oracle side)."""
    return ", ".join(f"({j}, {w})" for j, w in pinned_weights(n_buckets))


def linear_quality_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = N_BUCKETS,
    keep_milli: int = KEEP_MILLI,
) -> DataFrame:
    """Score every doc with the pinned hashed linear model.

    Returns ``(doc_id, n_tokens, score_milli, keep)`` for docs with ≥1
    whitespace token; ``score_milli = Σ w[bucket(tok)] div n_tokens``
    (token multiplicity counts, as in a bag-of-words model).
    """
    spark = docs.sparkSession
    weights = F.broadcast(
        spark.createDataFrame(
            pinned_weights(n_buckets), "j long, wt long"
        )
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    bucketed = toks.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 7), 16, 10).cast("long")
            % n_buckets
        ).alias("j"),
    )
    scored = (
        bucketed.join(weights, "j")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("wt").cast("long").alias("sum_w"),
        )
        .withColumn(
            "score_milli", F.expr("sum_w div n_tokens").cast("long")
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "score_milli",
        (F.col("score_milli") > keep_milli).alias("keep"),
    )
