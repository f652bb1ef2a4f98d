"""Per-group OLS trend slopes — exact integer least squares.

Trend detection ("is this segment's revenue rising?") over grouped
observations, computed from the closed-form simple-regression slope

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

entirely in integer arithmetic: the five sufficient statistics are one
map-side-combined ``groupBy`` aggregate over ``decimal(38,0)`` (the
cross products exceed int64 once groups pass ~10^5 rows of cents-scale
values — the same overflow family as components.py:54), and the final
division is an exact micros floor with the sign handled explicitly:

    sign(num) · (|num| · 1e6 div den)

because Spark's ``div`` truncates toward zero while SQL ``//``
implementations floor — on the positive ``|num|`` the two agree, so the
result hashes identically cross-engine for rising AND falling trends.

Scale shape: one aggregation shuffle on the group key, five decimal
sums with partial aggregation, zero windows, zero Python.  The
degenerate group (all x equal → zero denominator) yields a NULL slope
rather than an error.

Public knowledge: closed-form simple linear regression (any statistics
text); decimal sufficient-statistics aggregation is standard SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,0)"


def ols_slopes(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact per-group regression slope of integral ``y`` on integral
    ``x``, scaled by ``scale`` (micros by default).

    Returns ``(*group_cols, n, slope_scaled)`` where ``slope_scaled``
    is ``floor_toward_zero(slope · scale)`` as a BIGINT, NULL when the
    group has no x-variance.
    """
    x = F.col(x_col).cast(_DEC)
    y = F.col(y_col).cast(_DEC)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(_DEC).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    num = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    stats = agg.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        num.alias("__num"),
        den.alias("__den"),
    ).withColumn(
        "__scaled_abs",
        F.abs(F.col("__num")) * F.lit(int(scale)).cast(_DEC),
    )
    sign = (
        F.when(F.col("__num") < 0, F.lit(-1)).otherwise(F.lit(1))
    ).cast("long")
    return stats.select(
        *group_cols,
        "n",
        F.when(
            F.col("__den") > 0,
            sign * F.expr("cast(__scaled_abs div __den as bigint)"),
        )
        .cast("long")
        .alias("slope_scaled"),
    )
