"""Hot-items operator (SURVEY.md §2.4 A7, §2.6 O2).

Reference semantics (`recommender-online/u_like/guessLike_u_like.py:95-104`):
count collections per book over all users, sort desc, keep top-30.  The
reference does this with nested Python loops into a ``defaultdict``; here it
is one shuffle: partial (map-side) count → final count → TakeOrderedAndProject.

Scale notes: ``groupBy(key).count()`` does a map-side partial aggregate, so
the shuffle carries one row per (partition, key) — at 100 TB the shuffle
volume is bounded by |keys| × partitions, not row count.  The dim join is
broadcast (dim tables are small); ``orderBy().limit(n)`` compiles to
``TakeOrderedAndProject`` — no global sort is materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_items(
    fact: DataFrame,
    item_key: str,
    n: int = 30,
    dim: DataFrame | None = None,
    dim_key: str | None = None,
    dim_cols: list[str] | None = None,
) -> DataFrame:
    """Top-``n`` items by occurrence count in ``fact``.

    Deterministic under count ties: secondary sort on the item key, so the
    limit boundary is stable (required for oracle comparison).
    """
    counts = fact.groupBy(item_key).agg(F.count(F.lit(1)).alias("cnt"))
    if dim is not None:
        dk = dim_key or item_key
        # `is None`, not `or`: an explicitly-empty dim_cols means "key
        # only", not "all columns"
        cols = (
            [c for c in dim.columns if c != dk] if dim_cols is None else dim_cols
        )
        cols = [c for c in cols if c != dk]  # never duplicate the key
        if "cnt" in cols:
            raise ValueError("dim column 'cnt' collides with the count output")
        dim_sel = F.broadcast(dim.select(dk, *cols))
        # drop the fact-side key by Column reference, not by name: when a
        # caller passes dim_key == item_key a name-based drop would remove
        # BOTH key columns and break the orderBy below
        counts = counts.join(
            dim_sel, counts[item_key] == dim_sel[dk], "inner"
        ).drop(counts[item_key])
        key_out = dk
    else:
        key_out = item_key
    return counts.orderBy(F.desc("cnt"), F.asc(key_out)).limit(n)
