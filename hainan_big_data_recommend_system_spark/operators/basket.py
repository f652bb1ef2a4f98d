"""Market-basket co-occurrence and association rules — the classic
recommender primitive ("users who took A also took B") that the
reference system approximates through per-user profile similarity
(guessLike.py builds user→book profiles; simility_books.py:52-78 ranks
similar books).  Association rules answer the same product question
directly from transactions with exact counting statistics: support,
confidence, and lift per ordered item pair.

Spark-first shape, and why it scales:

- Pair generation is a **self-join on the basket key** — Catalyst
  shuffles both sides on the same key (one exchange each, co-located if
  the transaction table is bucketed by basket), and the per-basket pair
  blowup is bounded by ``max_basket_size`` (quadratic-per-basket work is
  the textbook skew hazard: one 10^5-item basket is 10^10 pairs, so
  oversized baskets are EXCLUDED, not sampled — deterministic and
  replicated by the oracle).
- Item supports are one map-side-combined ``groupBy(item)``; the rule
  join attaches them via two joins on single-item keys — the item
  dimension is dwarfed by the pair table, so AQE broadcasts it when it
  fits and falls back to a shuffle join when it does not.
- The basket total enters as a **1-row broadcast cross join**, never a
  driver-side ``.collect()``.
- All statistics are exact integers: ``confidence_micros`` via ``div``
  and ``lift_micros`` through ``decimal(38,0)`` cross-multiplication
  (supp_ab · N · 1e6 exceeds int64 at warehouse scale), so results
  hash identically cross-engine.

Public knowledge: support/confidence/lift as defined in Agrawal &
Srikant (VLDB 1994) and standard data-mining texts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,0)"


def basket_pair_counts(
    transactions: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int = 64,
) -> DataFrame:
    """Distinct-presence co-occurrence counts per unordered item pair.

    Returns ``(item_a, item_b, supp_ab)`` with ``item_a < item_b`` and
    ``supp_ab`` = number of baskets containing both.  Baskets larger
    than ``max_basket_size`` distinct items are dropped entirely (the
    O(k²) guard); membership is presence-based (duplicates within a
    basket count once).
    """
    b, i = F.col(basket_col), F.col(item_col)
    members = transactions.select(
        b.alias("__basket"), i.alias("__item")
    ).distinct()
    sized = members.join(
        members.groupBy("__basket")
        .agg(F.count(F.lit(1)).alias("__k"))
        .where(F.col("__k") <= max_basket_size)
        .select("__basket"),
        on="__basket",
    )
    left = sized.select("__basket", F.col("__item").alias("item_a"))
    right = sized.select("__basket", F.col("__item").alias("item_b"))
    return (
        left.join(right, on="__basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("supp_ab"))
    )


def association_rules(
    transactions: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int | None = None,
    min_support_ppm: int = 200,
    max_basket_size: int = 64,
) -> DataFrame:
    """Directed association rules over co-occurring item pairs.

    Support is RELATIVE by default (the Agrawal & Srikant definition):
    a pair qualifies when its basket count reaches
    ``max(2, ceil(n_baskets · min_support_ppm / 1e6))`` — the basket
    total enters as a 1-row broadcast, never a collect.  A fixed
    ABSOLUTE count (``min_support``, the round-7 default) is kept as an
    override for known-scale runs, because it is exactly the setting
    that explodes on growing data: the round-7 10× probe grew the rule
    list 335× under a fixed min_support=2 (PLANS §15); under relative
    support the threshold scales with the corpus and the rule list
    stabilizes.

    One row per ordered pair ``(antecedent, consequent)`` whose joint
    support reaches the threshold:

    - ``supp_ab`` — baskets containing both items;
    - ``supp_a`` / ``supp_b`` — marginal basket counts (post the
      ``max_basket_size`` filter, so the contingency table is
      consistent);
    - ``confidence_micros`` — ``supp_ab·1e6 div supp_a``, exact floor;
    - ``lift_micros`` — ``supp_ab·N·1e6 div (supp_a·supp_b)`` through
      ``decimal(38,0)`` (all factors positive, so ``div`` truncation is
      a floor and hashes identically to the oracle's ``//``).

    Lift > 1e6 means the pair co-occurs more than independence
    predicts — the "also bought" signal.
    """
    b, i = F.col(basket_col), F.col(item_col)
    members = transactions.select(
        b.alias("__basket"), i.alias("__item")
    ).distinct()
    sized = members.join(
        members.groupBy("__basket")
        .agg(F.count(F.lit(1)).alias("__k"))
        .where(F.col("__k") <= max_basket_size)
        .select("__basket"),
        on="__basket",
    )

    totals = F.broadcast(
        sized.select("__basket")
        .distinct()
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    pairs = (
        sized.select("__basket", F.col("__item").alias("item_a"))
        .join(
            sized.select("__basket", F.col("__item").alias("item_b")),
            on="__basket",
        )
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("supp_ab"))
    )
    if min_support is not None:  # absolute override
        pairs = pairs.where(F.col("supp_ab") >= min_support)
    else:  # relative (ceil via integer arithmetic, all positive)
        pairs = (
            pairs.crossJoin(totals)
            .where(
                F.col("supp_ab")
                >= F.greatest(
                    F.lit(2),
                    F.expr(
                        f"(__n * {int(min_support_ppm)} + 999999) "
                        "div 1000000"
                    ),
                )
            )
            .drop("__n")
        )
    # both rule directions from each unordered pair
    rules = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "supp_ab",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "supp_ab",
        )
    )

    supports = sized.groupBy(F.col("__item").alias("__it")).agg(
        F.count(F.lit(1)).alias("__supp")
    )

    out = (
        rules.join(
            F.broadcast(supports).withColumnRenamed("__supp", "supp_a"),
            rules["antecedent"] == F.col("__it"),
        )
        .drop("__it")
        .join(
            F.broadcast(supports).withColumnRenamed("__supp", "supp_b"),
            F.col("consequent") == F.col("__it"),
        )
        .drop("__it")
        .crossJoin(totals)
    )
    # decimal `div` keeps the lift an exact floor (hll.py:162 pattern);
    # supp_ab·N·1e6 exceeds int64 once baskets pass ~10^6
    return out.select(
        "antecedent",
        "consequent",
        F.col("supp_ab").cast("long").alias("supp_ab"),
        F.col("supp_a").cast("long").alias("supp_a"),
        F.col("supp_b").cast("long").alias("supp_b"),
        F.expr("supp_ab * 1000000L div supp_a").alias(
            "confidence_micros"
        ),
        F.expr(
            f"cast((cast(supp_ab as {_DEC}) * cast(__n as {_DEC})"
            f" * cast(1000000 as {_DEC}))"
            f" div (cast(supp_a as {_DEC}) * cast(supp_b as {_DEC}))"
            " as bigint)"
        ).alias("lift_micros"),
    )
