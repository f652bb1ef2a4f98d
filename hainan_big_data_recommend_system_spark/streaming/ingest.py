"""Streaming corpus ingestion with exact dedup against a persistent hash
index — the streaming face of the batch dedup ladder (north-star
extension; the batch counterpart is ``qcatalog/dedup.py`` /
``operators/dedup.exact_dedup``).

A 100 TB corpus is not built in one batch: documents arrive continuously
and each micro-batch must be deduplicated (a) within itself and (b)
against everything already ingested, WITHOUT rescanning the corpus — the
anti-join probes a compact content-hash index, work ∝ batch, not corpus.

Exactly-once discipline under foreachBatch's at-least-once contract:
both the surviving documents and their hashes are written to
epoch-partitioned directories (``epoch=N``) with per-epoch overwrite, and
the index anti-join EXCLUDES the current epoch's partition — so a
replayed epoch recomputes the identical survivor set from the same
inputs and overwrites its own previous output, never double-appends and
never mistakes its own half-written hashes for prior corpus content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window, functions as F


def dedup_ingest_writer(
    corpus_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """``foreachBatch`` writer: per micro-batch, keep one survivor (min
    id) per content hash within the batch, drop everything whose hash is
    already in the on-disk index (earlier epochs), then write survivors
    and their hashes under ``epoch=<id>`` with overwrite semantics."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        hashed = batch_df.withColumn(
            "__h", F.md5(F.col(text_col).cast("binary"))
        )
        rn = Window.partitionBy("__h").orderBy(F.asc(id_col))
        survivors = (
            hashed.withColumn("__rn", F.row_number().over(rn))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if os.path.isdir(index_dir) and any(
            e.startswith("epoch=") for e in os.listdir(index_dir)
        ):
            idx = spark.read.parquet(index_dir)  # partition col: epoch
            prior = idx.filter(F.col("epoch") != epoch_id).select(
                F.col("fingerprint").alias("__h")
            )
            survivors = survivors.join(
                F.broadcast(prior) if _small(prior) else prior, "__h", "left_anti"
            )
        survivors = survivors.localCheckpoint(eager=True)  # two sinks below
        survivors.drop("__h").write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"epoch={epoch_id}")
        )
        survivors.select(F.col("__h").alias("fingerprint")).write.mode(
            "overwrite"
        ).parquet(os.path.join(index_dir, f"epoch={epoch_id}"))

    return write


def _small(df: DataFrame, limit_rows: int = 1_000_000) -> bool:
    """Broadcast the index probe only while it is genuinely small — a
    bounded count probe, not a full scan (``limit(n+1).count()``)."""
    return df.limit(limit_rows + 1).count() <= limit_rows


def start_dedup_ingest(
    doc_stream: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Run the ingestion query (``availableNow`` drains what's present and
    stops — the nightly-ingest trigger; otherwise continuous)."""
    q = doc_stream.writeStream.foreachBatch(
        dedup_ingest_writer(corpus_dir, index_dir, id_col, text_col)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()


def read_ingested_corpus(spark, corpus_dir: str) -> DataFrame:
    """The deduplicated corpus across all ingested epochs (partition
    column ``epoch`` records provenance)."""
    return spark.read.parquet(corpus_dir)
