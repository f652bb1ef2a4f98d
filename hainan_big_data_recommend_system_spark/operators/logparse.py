"""Robust delimited-log parsing (SURVEY.md §2.1 S5/S6).

Reference semantics (`recommender-offline/log_analysis/log_analyze.py:21-37,47`):
daily ``book.log`` lines are comma-separated with ≥6 fields; field 0 is
``userId``, the LAST field is ``bookId``.  Malformed rows are skipped,
``bookId <= 0`` dropped, ``0`` treated as null, then books are accumulated
per user as a set.

Spark mapping: ``split`` + ``element_at(-1)`` + ``try_cast``-style parsing —
the PERMISSIVE equivalent of the reference's try/except fallback parser, as
one codegen'd expression chain (no Python in the row path).  ``try_cast``
yields NULL on garbage instead of raising, exactly mirroring the
reference's "skip malformed rows" behavior.

Scale: a text scan parallelizes by file split; the per-user ``collect_set``
is one shuffle with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def parse_log_lines(
    df: DataFrame,
    line_col: str = "line",
    min_fields: int = 2,
) -> DataFrame:
    """S6: parse ``userId,...,bookId`` lines; returns (userId, bookId) with
    malformed rows dropped and ``bookId <= 0`` filtered out."""
    parts = F.split(F.col(line_col), ",")
    user_id = F.element_at(parts, 1).try_cast("bigint")
    book_id = F.element_at(parts, -1).try_cast("bigint")
    return (
        df.select(
            user_id.alias("userId"),
            book_id.alias("bookId"),
            F.size(parts).alias("__nf"),
        )
        .filter(
            (F.col("__nf") >= min_fields)
            & F.col("userId").isNotNull()
            & F.col("bookId").isNotNull()
            & (F.col("bookId") > 0)
        )
        .drop("__nf")
    )


def user_book_sets(parsed: DataFrame) -> DataFrame:
    """A5/E2: distinct books per user, as a deterministically sorted array
    (the reference's ``{userId: set(bookId)}``, `log_analyze.py:51`)."""
    return parsed.groupBy("userId").agg(
        F.sort_array(F.collect_set("bookId")).alias("books")
    )


def parse_jsonl_corpus(
    df: DataFrame, line_col: str = "line"
) -> DataFrame:
    """Corrupt-tolerant JSONL corpus scan — the interchange format LLM
    corpora actually ship in (one JSON object per line; a multi-TB crawl
    dump always contains truncated/garbled lines, and one of them must
    never kill the job).

    ``from_json`` in PERMISSIVE mode parses each line against the corpus
    schema; a malformed line yields a null struct (or null required
    fields) and is emitted with ``ok = 0`` and its raw line preserved for
    quarantine — the S5/S6 robustness discipline on the JSON format.
    Scan-local, no UDF: JSON parsing is a JVM expression inside
    whole-stage codegen."""
    schema = "doc_id bigint, text string, lang string, source string"
    parsed = F.from_json(F.col(line_col), schema)
    ok = (
        parsed.isNotNull()
        & parsed["doc_id"].isNotNull()
        & parsed["text"].isNotNull()
    )
    return df.select(
        parsed["doc_id"].alias("doc_id"),
        parsed["text"].alias("text"),
        parsed["lang"].alias("lang"),
        parsed["source"].alias("source"),
        ok.cast("bigint").alias("ok"),
        F.when(~ok, F.col(line_col)).alias("quarantined_line"),
    )
