"""Edit-distance similarity self-join (fuzzy string matching).

The missing rung between exact dedup and token-set similarity
(:mod:`.dedup`): find every pair of strings within Levenshtein distance
``k`` — near-identical titles, typo'd names, OCR noise — without an
all-pairs comparison.  Classic q-gram count filtering (Gravano et al.
2001, "Approximate String Joins in a Database (Almost) for Free"):

- an edit destroys at most ``q`` of a string's q-grams, so two strings
  with edit distance ≤ k and max length L share at least
  ``L − q + 1 − k·q`` q-grams — which is ≥ 1 whenever ``L ≥ q·(k+1)``;
- therefore, for strings at least ``q·(k+1)`` long, EVERY true pair
  shares some q-gram, and a posting join on q-grams is a lossless
  candidate generator;
- candidates are verified with the exact ``levenshtein`` built-in
  (identical DP semantics in Spark and DuckDB → fully oracle-able).

Shorter strings are filtered out (both engines apply the same filter):
below ``q·(k+1)`` the shared-gram guarantee fails, and that regime —
nearly-empty strings — belongs to an exact block join, not this operator.

Scale shape: scan-local gram explode (distinct grams per string), one
shuffle join on the gram key plus a length-band predicate, distinct
pairs, then the verify filter.  Work is quadratic only within a gram
bucket — the same contract as the MinHash/posting ladder.  Gram-frequency
skew is bounded by q (larger q ⇒ sparser buckets); a stop-gram cap is
deliberately NOT applied because dropping a gram can orphan a pair whose
only shared gram it was, breaking the lossless guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    q: int = 4,
) -> DataFrame:
    """All pairs with ``levenshtein ≤ max_dist`` among strings of length
    ≥ ``q·(max_dist+1)``.  Returns ``(id_a, id_b, dist)`` with
    ``id_a < id_b``.

    Strings ride the gram shuffle (they are name/title-sized by
    contract); the alternative — id-only shuffle plus two joins back —
    trades one wide exchange for two more joins and loses at this
    string length.
    """
    min_len = q * (max_dist + 1)
    base = df.select(
        F.col(id_col).alias("__id"), F.col(str_col).alias("__s")
    ).filter(F.length("__s") >= min_len)
    grams = base.select(
        "__id",
        "__s",
        F.length("__s").alias("__len"),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length(__s) - {q} + 1),"
                    f" i -> substring(__s, i, {q}))"
                )
            )
        ).alias("__g"),
    )
    a = grams.select(
        F.col("__g"),
        F.col("__id").alias("id_a"),
        F.col("__s").alias("__sa"),
        F.col("__len").alias("__la"),
    )
    b = grams.select(
        F.col("__g"),
        F.col("__id").alias("id_b"),
        F.col("__s").alias("__sb"),
        F.col("__len").alias("__lb"),
    )
    cand = (
        a.join(b, "__g")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        )
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
    )
    return cand.filter(
        F.levenshtein("__sa", "__sb") <= max_dist
    ).select(
        "id_a",
        "id_b",
        F.levenshtein("__sa", "__sb").cast("long").alias("dist"),
    )
