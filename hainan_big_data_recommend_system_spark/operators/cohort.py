"""Cohort retention — the activation/engagement matrix behind every
"do users come back?" dashboard: bucket each user into a cohort by
their FIRST qualifying event's period (e.g. signup day/week), then for
each later period count how many of that cohort were active.

Spark-first shape (two shuffles total, both keyed and partial-agg'd):

1. ``groupBy(user).agg(min(ts))`` -> cohort anchor (one row per user).
2. distinct (user, activity_period) joined back to the anchor on the
   user key (broadcast-eligible once the user dimension is narrow),
   then ``groupBy(cohort_period, period_offset).agg(countDistinct)``.

Period arithmetic is pure integer math on epoch days — no timestamp
truncation functions, so the bucketing is bit-identical across engines
(DuckDB date_trunc week vs Spark trunc would both work but disagree on
week-start conventions; epoch-day `div` does not).

At 100 TB: the anchor table is |users| rows — tiny next to the event
log — and the offset aggregation is a straight keyed count-distinct
that AQE can re-plan on skewed cohorts.  No windows, no Python.

Public knowledge: standard cohort-analysis formulation (e.g. open
analytics stacks; Croll & Yoskovitz, Lean Analytics 2013).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
    anchor_filter=None,
) -> DataFrame:
    """``(cohort_period, period_offset, n_active, cohort_size,
    retention_bp)`` — one row per (cohort, offset) pair that has at
    least one active user.

    ``cohort_period`` is the user's first qualifying event's period
    index (``epoch_day div period_days`` — an absolute integer, so
    cohorts are stable across runs and engines).  ``anchor_filter`` is
    an optional Column restricting which events START a user's clock
    (e.g. ``F.col("event_type") == "signup"``); activity always counts
    every event.
    """
    u = F.col(user_col)
    # exact integer `div` twice (epoch day, then period index): double
    # `/` + cast can truncate across a boundary at large epochs — the
    # ADVICE r6 histogram_quantiles failure class.  Events are
    # post-1970 so floor == integer truncation.
    period = F.expr(
        f"(unix_micros({ts_col}) div 86400000000) div {int(period_days)}"
    )

    anchors = events if anchor_filter is None else events.where(anchor_filter)
    cohorts = anchors.groupBy(u.alias("user")).agg(
        F.min(period).alias("cohort_period")
    )
    active = events.select(u.alias("user"), period.alias("p")).distinct()

    joined = active.join(cohorts, on="user", how="inner").where(
        F.col("p") >= F.col("cohort_period")
    )
    per_cell = joined.groupBy("cohort_period", (F.col("p") - F.col("cohort_period")).alias("period_offset")).agg(
        F.countDistinct("user").alias("n_active")
    )
    sizes = cohorts.groupBy("cohort_period").agg(
        F.countDistinct("user").alias("cohort_size")
    )
    return per_cell.join(sizes, on="cohort_period").select(
        "cohort_period",
        "period_offset",
        "n_active",
        "cohort_size",
        F.expr("n_active * 10000 div cohort_size").alias("retention_bp"),
    )
