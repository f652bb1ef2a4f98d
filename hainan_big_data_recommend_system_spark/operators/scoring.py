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
    item_cols: str | list[str],
    sim_col: str,
    order_by: list[Column],
    score_col: str = "score",
    int_scale: int | None = None,
) -> DataFrame:
    """A8: ``score(item) = Σ_j sim_j / ln(j+1)`` with j = occurrence index of
    the item when contributors are visited in ``order_by`` order.

    ``item_cols`` may be composite (e.g. ``(user, item)`` for per-user
    scoring).  With ``int_scale`` set, each contribution is rounded to
    ``1/int_scale`` units before summing — exact integer sums, deterministic
    under any aggregation order (see qcatalog package docstring); the score
    column is then the scaled integer.

    Returns ``(*item_cols, score_col)``.
    """
    keys = [item_cols] if isinstance(item_cols, str) else list(item_cols)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    rn = F.row_number().over(w)
    contrib = F.col(sim_col) / F.log(rn + F.lit(1))
    if int_scale is not None:
        contrib = F.round(contrib * int_scale).cast("bigint")
    return (
        df.select(*keys, contrib.alias("__contrib"))
        .groupBy(*keys)
        .agg(F.sum("__contrib").alias(score_col))
    )
