"""Robust per-group outlier detection — exact integer median/MAD.

The reference pipeline consumes raw event values with no outlier
screen (guessLike.py trusts every collect/score row); at corpus scale
a single corrupted feed silently skews every downstream aggregate, so
an engine-side robust filter (median + median-absolute-deviation, the
standard robust z-score) is table stakes for a training-data pipeline.

Why NOT ``percentile_approx`` / a per-group sort window:

- approx percentiles are not reproducible cross-engine (and not even
  run-to-run under AQE re-partitioning) — this operator's contract is
  an EXACT lower median in pure integer arithmetic, so results hash
  identically against an independent oracle;
- a ``row_number`` window over the raw rows sorts each group in one
  task — with a handful of event types and 10^11 rows that is the
  classic one-reducer-per-group collapse.

Instead the median is found by **value compression**: aggregate to
``(group, value, count)`` (map-side combined, output bounded by the
value DOMAIN, not the row count — cents values repeat heavily), then a
running-count window over the *distinct* values per group finds the
value whose cumulative count first reaches ``(n+1) div 2``.  The
window partition holds at most |distinct values| rows, millions of
times smaller than the group.  MAD is the same pass over
``|v - median|``; medians/MADs join back as one-row-per-group
broadcasts.

Lower median (no interpolation) keeps everything integral: for even
``n`` the lower of the two middle values is taken — deterministic and
replayable in ANSI SQL.

Public knowledge: MAD robust scale estimator (Hampel 1974); the
count-compression median is folklore SQL (GROUP BY + running sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_group_quantile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    q_num: int,
    q_den: int,
    out_col: str = "quantile",
) -> DataFrame:
    """Exact lower ``q_num/q_den``-quantile of an integral column per
    group: the value at rank ``ceil(q·n)`` in ascending order —
    ``q = 1/2`` is the lower median, ``9/10`` is p90.

    One row per group: ``(*group_cols, out_col)``.  Shuffles once on
    ``(group, value)`` (pre-aggregated map-side) and once on the group
    key; the ordering window runs over distinct values only.

    The per-group totals join is broadcast-HINTED: correct for the
    bounded-group shape every caller here has (event types, priorities
    — dozens of rows).  For a HIGH-cardinality group key (millions of
    groups) drop the hint and let AQE pick the join — the totals
    relation is then itself large and must shuffle.
    """
    if not 0 < q_num <= q_den:
        raise ValueError("quantile must be in (0, 1]")
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    cum = counts.withColumn("__cum", F.sum("__cnt").over(w))
    totals = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n")
    )
    # rank ceil(q*n), exact integer
    target = F.expr(
        f"(__n * {int(q_num)} + {int(q_den)} - 1) div {int(q_den)}"
    )
    return (
        cum.join(F.broadcast(totals), on=group_cols)
        .where(
            (F.col("__cum") >= target)
            & (F.col("__cum") - F.col("__cnt") < target)
        )
        .select(*group_cols, F.col(value_col).alias(out_col))
    )


def exact_group_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "median",
) -> DataFrame:
    """Exact lower median — ``exact_group_quantile`` at q = 1/2
    (``ceil(n/2)`` equals the lower-median rank ``(n+1) div 2``)."""
    return exact_group_quantile(
        df, group_cols, value_col, 1, 2, out_col
    )


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k_mads: int = 3,
) -> DataFrame:
    """Rows whose value deviates from the group median by more than
    ``k_mads`` × MAD (strict), annotated with the robust statistics.

    ``value_col`` must already be integral (integerize floats to
    cents/micros upstream).  Returns the input columns plus
    ``median_<value_col>``, ``mad_<value_col>`` and
    ``deviation_<value_col>`` — all exact integers.
    """
    med_col = f"median_{value_col}"
    mad_col = f"mad_{value_col}"
    dev_col = f"deviation_{value_col}"

    med = exact_group_median(df, group_cols, value_col, med_col)
    withdev = df.join(F.broadcast(med), on=group_cols).withColumn(
        dev_col, F.abs(F.col(value_col) - F.col(med_col))
    )
    mad = exact_group_median(withdev, group_cols, dev_col, mad_col)
    return withdev.join(F.broadcast(mad), on=group_cols).where(
        F.col(dev_col) > F.lit(int(k_mads)) * F.col(mad_col)
    )
