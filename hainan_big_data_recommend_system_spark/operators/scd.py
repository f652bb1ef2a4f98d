"""Type-2 slowly-changing-dimension build — turn a change-event log
(one row per observation of an entity's attributes) into versioned
dimension rows with ``effective_from`` / ``effective_to`` validity
ranges and an ``is_current`` flag, collapsing consecutive observations
with unchanged attributes into one version (the classic Kimball SCD2
load, rebuilt as a single declarative pass).

Spark-first shape: one shuffle on the entity key, then two window
passes over (entity, time) partitions:

1. change detection: ``lag(attrs) over (partition by key order by ts)``
   -> keep rows where any tracked attribute differs from the previous
   observation (gaps-and-islands, island heads only);
2. validity: ``lead(effective_from)`` over the surviving heads gives
   each version's exclusive ``effective_to``; the last version is
   open-ended (NULL) and flagged current.

Both windows partition on the entity key — never unbounded — so the
plan is two sort-within-partition passes over one exchange.  At 100 TB
the entity key is the natural partitioner and AQE handles skewed
entities; no Python, no collect.

Public knowledge: Kimball & Ross, *The Data Warehouse Toolkit* (type-2
dimension); gaps-and-islands change collapse is folklore SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def build_scd2(
    observations: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """``(key, effective_from, effective_to, is_current, version,
    <attr_cols...>)`` — one row per distinct consecutive attribute
    state per entity.

    ``tiebreak_col`` breaks equal-timestamp observations (keep a total
    order per entity so the build is deterministic); when two
    observations share a timestamp the later one under the tie-break
    wins that instant (its predecessor gets a zero-length validity,
    which is then collapsed only if attributes are unchanged).
    """
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(a).over(w)
        # null-safe inequality: a change to/from NULL is a change
        changed = changed | ~F.col(a).eqNullSafe(prev)
    heads = (
        observations.withColumn("__first", F.lag(ts_col).over(w).isNull())
        .withColumn("__changed", changed)
        .where(F.col("__first") | F.col("__changed"))
    )

    wv = Window.partitionBy(key_col).orderBy(*order)
    return heads.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(wv).alias("effective_to"),
        F.lead(ts_col).over(wv).isNull().alias("is_current"),
        F.row_number().over(wv).cast("long").alias("version"),
        *attr_cols,
    )


def snapshot_at(scd2: DataFrame, at) -> DataFrame:
    """Point-in-time view of a :func:`build_scd2` dimension: the single
    version per key whose ``[effective_from, effective_to)`` range
    covers ``at`` — a scan-local filter, no join or window."""
    at = F.lit(at)
    return scd2.where(
        (F.col("effective_from") <= at)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > at))
    )
