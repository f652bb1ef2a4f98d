"""Banded interval join — "pairs within ±tolerance" without a cross join
(extension surface; SURVEY.md §2.3 lists range/interval joins as absent in
the reference).

Naive formulations of ``|a.ts - b.ts| <= tol`` are either a cross join with
a filter (quadratic rows) or a theta-join Catalyst executes as
BroadcastNestedLoop — both dead at scale.  The banded pattern turns it into
an EQUI join:

1. bucket every timestamp into ``bucket = floor(epoch / tol)``;
2. a matching pair is at most one bucket apart, so replicate ONE side into
   its 3 candidate buckets (−1, 0, +1) — 3× one side, never n²;
3. hash equi-join on (key, bucket) — ordinary shuffle join, AQE-eligible —
   then apply the exact ``|dt| <= tol`` filter to drop the band's false
   positives.

Shuffle volume: |left| + 3·|right|.  Candidate pairs per bucket are bounded
by local density, not stream length — the same trick event-time engines use
for stream-stream interval joins (Spark's own stream-stream join does the
equivalent with watermark-bounded state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
    suffix: str = "_r",
) -> DataFrame:
    """All pairs (left, right) sharing ``on`` with
    ``|left_ts - right_ts| <= tolerance_s`` seconds.

    Right-side columns come back suffixed.  Exact semantics — banding only
    prunes candidates, the final filter is the real predicate.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if tolerance_s <= 0:
        raise ValueError(
            f"tolerance_s must be > 0 (got {tolerance_s}); for exact "
            "timestamp matching use an equi-join on the timestamp column"
        )
    tol_us = int(tolerance_s) * 1_000_000

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    lb = left.withColumn("__bucket", (l_us / tol_us).cast("bigint"))
    rb = right.select(
        *[F.col(c).alias(f"{c}{suffix}" if c not in keys else c) for c in right.columns]
    ).withColumn(
        "__bucket",
        F.explode(
            F.array(
                (F.unix_micros(F.col(f"{right_ts}{suffix}")) / tol_us).cast("bigint") - 1,
                (F.unix_micros(F.col(f"{right_ts}{suffix}")) / tol_us).cast("bigint"),
                (F.unix_micros(F.col(f"{right_ts}{suffix}")) / tol_us).cast("bigint") + 1,
            )
        ),
    )
    dt = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(f"{right_ts}{suffix}"))
    return (
        lb.join(rb, [*keys, "__bucket"])
        .filter(F.abs(dt) <= tol_us)
        .drop("__bucket")
    )
