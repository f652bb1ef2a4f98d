"""Fixed-size token chunking with overlap — the document→passage
transform every retrieval/embedding pipeline runs (RAG indexing, dense
retriever training, long-doc eval): windows of ``chunk_tokens`` tokens
advancing by ``chunk_tokens - overlap``, the final partial window kept
when it adds new tokens.

Pure column expressions: tokenize once (split), generate window starts
with ``sequence`` (stride arithmetic, no UDF), slice per start — the
chunking IS the scan, and chunk boundaries are deterministic so the
passage table is reproducible and oracle-checkable.  Contrast with
:mod:`.packing` (which concatenates docs INTO fixed sequences for
training); chunking splits docs into overlapping passages for
retrieval.

Scale shape: output rows ≈ tokens/stride per doc, scan-local explode —
no shuffle at all until the caller aggregates.

Public knowledge: standard RAG practice (e.g. Lewis et al. 2020
retrieval-augmented generation; fixed-window passage splitting goes
back to TREC passage retrieval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """``(doc_id, chunk_index, start_token, n_tokens, chunk_text)`` —
    whitespace tokens windowed with overlap.  Every token lands in at
    least one chunk; a doc shorter than ``chunk_tokens`` yields exactly
    one chunk."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap={overlap} must be in [0, chunk_tokens={chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")
    n = F.size(toks)
    # last window start: the smallest multiple of stride covering the
    # tail — ceil((n - chunk)/stride) capped at >= 0
    last = F.greatest(
        F.lit(0),
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int"),
    )
    starts = F.sequence(F.lit(0), last * stride, F.lit(stride))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        n.alias("__n"),
        F.posexplode(starts).alias("chunk_index", "start_token"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("start_token") + 1, chunk_tokens
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.col("start_token").cast("long").alias("start_token"),
        F.least(
            F.lit(chunk_tokens), F.col("__n") - F.col("start_token")
        )
        .cast("long")
        .alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
