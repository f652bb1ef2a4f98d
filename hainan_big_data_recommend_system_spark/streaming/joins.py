"""Stream-stream interval join (extension surface; the streaming-native
counterpart of ``operators/rangejoin.interval_join``).

Structured Streaming executes a time-range equi-key join with
watermark-bounded state: each side buffers only rows younger than
``watermark + tolerance``, so state is O(rate × horizon) instead of
unbounded.  This is the engine-managed version of the batch operator's
bucket banding — same semantics, state eviction instead of bucket
replication.

Inner joins emit eagerly per micro-batch; the watermark exists to EVICT
state (and to make outer variants decidable), not to delay output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
    watermark: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """Pairs with equal ``on`` and ``|left_ts - right_ts| <= tolerance_s``,
    both sides streaming.  Column layout matches the batch operator
    (right side suffixed) so batch/stream results are directly comparable.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.select(
        *[
            F.col(c).alias(f"{c}{suffix}" if c != on else c)
            for c in right.columns
        ]
    ).withWatermark(f"{right_ts}{suffix}", watermark)

    rts = f"{right_ts}{suffix}"
    cond = (
        f"{rts} BETWEEN {left_ts} - interval {tolerance_s} seconds "
        f"AND {left_ts} + interval {tolerance_s} seconds"
    )
    return lw.join(rw.withColumnRenamed(on, f"__{on}"),
                   F.expr(f"{on} = __{on} AND {cond}")).drop(f"__{on}")
