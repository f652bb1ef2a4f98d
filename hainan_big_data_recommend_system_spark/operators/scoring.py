"""Rank-discounted score fold (SURVEY.md §2.4 A8, §2.5 W5).

Reference semantics (`recommender-online/u_like/guessLike_u_like.py:119-124`,
`log_analysis/log_analyze.py:174-179`): iterate similar users in similarity
order; for each of their books ``cnt[b] += 1; score[b] += sim / ln(cnt[b]+1)``.
A book's j-th contributing occurrence is discounted by ``1/ln(j+1)`` — the
fold is order-dependent on the user similarity ranking.

Spark mapping preserves the exact semantics declaratively:
``rn = row_number() over (partition by item order by sim_rank)`` then
``groupBy(item).agg(sum(sim / ln(rn + 1)))``.  The per-item occurrence index
replaces the mutable counter; the window order pins the reference's
iteration order.

Scale: one shuffle on the item key (window + agg share it).  The discount
and sum are codegen'd; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def rank_discounted_score(
    df: DataFrame,
    item_col: str,
    sim_col: str,
    order_by: list[Column],
    score_col: str = "score",
) -> DataFrame:
    """A8: ``score(item) = Σ_j sim_j / ln(j+1)`` with j = occurrence index of
    the item when contributors are visited in ``order_by`` order.

    Returns ``(item_col, score_col)``.
    """
    w = Window.partitionBy(item_col).orderBy(*order_by)
    rn = F.row_number().over(w)
    contrib = (F.col(sim_col) / F.log(rn + F.lit(1))).alias("__contrib")
    return (
        df.select(item_col, contrib)
        .groupBy(item_col)
        .agg(F.sum("__contrib").alias(score_col))
    )
