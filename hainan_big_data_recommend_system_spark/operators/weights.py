"""Tag-weight normalization + weighted-document construction
(SURVEY.md §2.4 A3, §2.8 F10/F11, §2.3 J2).

Reference semantics (`recommender-offline/simility_books/simility_books.py:38-41`):

- per book, normalize each tag's vote count ``num`` into a weight in {1..4}:
  ``ceil((num + 0.1 - min) * 4 / (max + 0.1 - min))``;
- emit the tag ``weight`` times into the book's document string — i.e.,
  term-frequency boosting by repetition (the signature "weighted document" op,
  ``(tag + ' ') * weight``).

Spark mapping: the min/max are a window over the item key (one shuffle,
reused by the subsequent concat agg); repetition is ``array_repeat``; the
document is an ordered ``collect_list`` of structs → ``sort_array`` →
``concat_ws`` — the explicit in-group sort replaces MySQL's incidental
``ORDER BY bookId`` (`simility_books.py:37`), making the op deterministic.

Scale notes: both stages shuffle on the same key; Catalyst reuses the
exchange.  No Python touches the hot path — repetition and sorting are
codegen'd array expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def normalize_weights(
    df: DataFrame,
    key: str,
    num_col: str,
    weight_col: str = "weight",
    levels: int = 4,
) -> DataFrame:
    """A3+F11: per-``key`` min/max scaling of ``num_col`` into {1..``levels``}."""
    w = Window.partitionBy(key)
    min_n = F.min(num_col).over(w)
    max_n = F.max(num_col).over(w)
    weight = F.ceil(
        (F.col(num_col) + F.lit(0.1) - min_n) * levels / (max_n + F.lit(0.1) - min_n)
    ).cast("int")
    return df.withColumn(weight_col, weight)


def weighted_document(
    df: DataFrame,
    key: str,
    term_col: str,
    weight_col: str,
    order_by: list[str],
    doc_col: str = "doc",
) -> DataFrame:
    """F10: build one space-joined document per ``key`` where each term is
    repeated ``weight`` times, terms ordered by ``order_by`` within the group.

    Returns ``(key, doc_col)``.
    """
    repeated = F.concat_ws(" ", F.array_repeat(F.col(term_col), F.col(weight_col)))
    ordered_struct = F.struct(*[F.col(c) for c in order_by], repeated.alias("__t"))
    return (
        df.groupBy(key)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(ordered_struct)), lambda s: s["__t"]
                ),
            ).alias(doc_col)
        )
    )
