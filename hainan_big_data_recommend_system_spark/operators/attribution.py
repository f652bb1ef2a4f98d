"""Multi-touch conversion attribution (U-shaped / position-based).

Beyond last-touch (an as-of join — see operators/asof.py), marketing
and growth analytics split each conversion's credit across ALL
touchpoints in a lookback window: the standard position-based scheme
gives 40% to the first touch, 40% to the last, and splits 20% across
the middles.  Floating-point credit splitting breaks order-insensitive
accounting (0.2/3 repeated never sums back), so credit here is EXACT
integer basis points: each conversion distributes precisely 10_000 bp —
middles get ``2000 div (n-2)`` each and the earliest ``2000 mod (n-2)``
middles get one extra bp — making "total credit == 10_000 *
conversions" a hard invariant at any scale, on any engine.

Spark shape: one user-keyed range join (touch within [conv - lookback,
conv)), one window partitioned per CONVERSION (bounded by the lookback
fanout), one keyed aggregation.  Conversions with no touch in window
are credited to the sentinel channel ``(none)`` so the accounting
identity covers every conversion.

Public knowledge: position-based attribution is standard marketing
analytics (documented across public analytics stacks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def position_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str = "user",
    ts_col: str = "ts",
    conv_id_col: str = "conv_id",
    channel_col: str = "channel",
    lookback_seconds: int = 3 * 86400,
    first_bp: int = 4000,
    last_bp: int = 4000,
) -> DataFrame:
    """Per-touch credit rows: ``(conv_id, channel, touch_rank,
    n_touches, credit_bp)``.

    ``conversions``: one row per conversion (user, ts, conv_id).
    ``touches``: candidate touchpoints (user, ts, channel).  A touch
    qualifies when ``conv_ts - lookback < touch_ts < conv_ts``.  With
    one qualifying touch it takes all 10_000 bp; with two, the split is
    ``first_bp + (middle share) | last_bp`` folded to 5000/5000 for the
    defaults; with n >= 3 the U-shape applies.
    """
    mid_bp = 10_000 - first_bp - last_bp
    conv = conversions.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("conv_ts"),
        F.col(conv_id_col).alias("conv_id"),
    )
    tch = touches.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("touch_ts"),
        F.col(channel_col).alias("channel"),
    )
    touched = conv.join(tch, on="user").where(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.timestamp_micros(
                F.unix_micros(F.col("conv_ts"))
                - F.lit(int(lookback_seconds) * 1_000_000)
            )
        )
    )
    w = Window.partitionBy("conv_id").orderBy("touch_ts", "channel")
    ranked = touched.select(
        "conv_id",
        "channel",
        F.row_number().over(w).alias("touch_rank"),
        F.count("*").over(Window.partitionBy("conv_id")).alias("n_touches"),
    )
    n, rk = F.col("n_touches"), F.col("touch_rank")
    base_mid = F.expr(f"{mid_bp} div (n_touches - 2)")
    extra = F.expr(f"{mid_bp} % (n_touches - 2)")
    credit = (
        F.when(n == 1, F.lit(10_000))
        .when(n == 2, F.when(rk == 1, 10_000 - last_bp).otherwise(last_bp))
        .when(rk == 1, F.lit(first_bp))
        .when(rk == n, F.lit(last_bp))
        .otherwise(
            base_mid + F.when(rk - 1 <= extra, F.lit(1)).otherwise(F.lit(0))
        )
    )
    credited = ranked.select(
        "conv_id",
        "channel",
        F.col("touch_rank").cast("long").alias("touch_rank"),
        F.col("n_touches").cast("long").alias("n_touches"),
        credit.cast("long").alias("credit_bp"),
    )
    untouched = conv.join(
        touched.select("conv_id").distinct(), on="conv_id", how="left_anti"
    ).select(
        "conv_id",
        F.lit("(none)").alias("channel"),
        F.lit(1).cast("long").alias("touch_rank"),
        F.lit(0).cast("long").alias("n_touches"),
        F.lit(10_000).cast("long").alias("credit_bp"),
    )
    return credited.unionByName(untouched)


def channel_report(credits: DataFrame) -> DataFrame:
    """Collapse per-touch credit to the channel dashboard:
    ``(channel, n_touches, n_conversions, credit_bp_total)``."""
    return credits.groupBy("channel").agg(
        F.sum((F.col("n_touches") > 0).cast("long")).alias("n_touches"),
        F.countDistinct("conv_id").alias("n_conversions"),
        F.sum("credit_bp").alias("credit_bp_total"),
    )
