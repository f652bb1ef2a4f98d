"""Seeded negative sampling — the training-example op every implicit-
feedback recommender (BPR, word2vec-style skip-gram, two-tower
retrieval) needs: for each user, k items they did NOT interact with,
deterministic under a seed so the training set is reproducible.

Reference analogue: the reco assembly's anti-join discipline (P8/P9 —
`guessLike_u_like.py` removes already-collected books); this is the
same anti-membership applied to TRAINING data generation instead of
serving.

Spark-first shape (no per-row Python, no rejection loop on the driver):

1. every user gets ``oversample × k`` candidate SLOTS; the candidate
   item for (user, slot) is a pinned md5 hash mod the item-id span —
   the same engine-portable hash family as the samplers
   (``qcatalog/profile_logs``), so the oracle replays it exactly;
2. one LEFT ANTI join against the interactions kills true positives —
   the only shuffle, on (user, item), exactly the exact-dedup shape;
3. a per-user window keeps the first ``k`` surviving slots in slot
   order — deterministic, and short only for users who interacted with
   nearly the whole catalog (the oversample bounds that probability;
   the honest failure mode is FEWER negatives, never a false negative).

Scale: work ∝ users × oversample·k candidate rows + one anti-join
against interactions — no |users| × |items| blowup anywhere.

Public knowledge: Rendle et al. 2009 (BPR); Mikolov et al. 2013
(negative sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sample_negatives(
    interactions: DataFrame,
    k: int,
    n_items: int,
    user_col: str = "user_id",
    item_col: str = "item_id",
    seed: str = "neg-v1",
    oversample: int = 3,
    item_base: int = 1,
) -> DataFrame:
    """``(user_id, neg_rank, neg_item)`` — ``k`` seeded non-interacted
    items per user with at least one interaction.  Items are drawn from
    the dense id span ``[item_base, item_base + n_items)``; pass the
    catalog's real span (sparse catalogs should remap ids first, the
    standard embedding-table preparation)."""
    if k < 1 or oversample < 1:
        raise ValueError(f"k={k} and oversample={oversample} must be >= 1")
    if n_items <= k:
        raise ValueError(
            f"n_items={n_items} must exceed k={k} negatives per user"
        )
    users = interactions.select(
        F.col(user_col).alias("user_id")
    ).distinct()
    slots = users.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(oversample * k - 1))
        ).alias("slot"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(seed), F.col("user_id"), F.col("slot")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    cand = slots.select(
        "user_id",
        "slot",
        (F.lit(item_base) + F.pmod(h, F.lit(n_items))).alias("neg_item"),
    )
    pos = interactions.select(
        F.col(user_col).alias("user_id"),
        F.col(item_col).alias("neg_item"),
    ).distinct()
    survivors = cand.join(pos, ["user_id", "neg_item"], "left_anti")
    # a slot can also collide with ANOTHER slot's item: dedup per user
    # so the k negatives are distinct items, then keep slot order
    w_dup = Window.partitionBy("user_id", "neg_item").orderBy("slot")
    w_rank = Window.partitionBy("user_id").orderBy("slot")
    return (
        survivors.withColumn("__d", F.row_number().over(w_dup))
        .filter(F.col("__d") == 1)
        .withColumn("neg_rank", F.row_number().over(w_rank))
        .filter(F.col("neg_rank") <= k)
        .select(
            "user_id",
            F.col("neg_rank").cast("long").alias("neg_rank"),
            "neg_item",
        )
    )
