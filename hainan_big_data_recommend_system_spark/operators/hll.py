"""Deterministic HyperLogLog distinct-count sketch — fully oracle-checkable.

Spark's native ``approx_count_distinct`` (HLL++) is correct but its
register layout is engine-internal, so the existing sketch queries are
rows-only (`sketch_event_stats`).  This operator implements the classic
Flajolet-Furet-Gandouet-Meunier 2007 HLL with every stage pinned to
exact integers, so the WHOLE sketch — registers and estimate — is
bit-for-bit reproducible in any engine from the same rows:

- hash: first 15 hex digits of md5 (60 bits — fits int64 signed in both
  engines) of the value's string form;
- bucket: top ``b`` bits; rank: position of the first 1-bit in the
  remaining 60-b (``rest = 0`` → max rank), via integer ``length(bin())``;
- registers: ``groupBy(bucket).max(rank)`` — one shuffle of at most
  2^b rows per group, the whole point at 100 TB (the registers are the
  mergeable state; re-aggregation across partitions/days is another
  ``max``);
- estimate: the harmonic mean is computed as an EXACT integer —
  ``sum(2^(R - M_j))`` (left-shifts, no floats) with empty buckets
  contributing ``2^R`` — and the alpha_m bias constant enters as a
  precomputed integer numerator, so the final value is one integer
  division.  No ``ln``/``pow`` calls whose last-ulp behavior could
  differ across engines.

Small-range correction (round 7 — the r6 verdict's #5): with
``small_range_correction=True`` the classic linear-counting fallback is
applied — when the raw estimate is at or below ``2.5·m`` and empty
buckets exist, the estimate becomes ``m·ln(m/V)`` (V = empty buckets).
To stay integer-exact cross-engine, ``m·ln(m/V)`` enters as a PINNED
lookup (:func:`linear_counting_estimates` — one integer per possible V,
computed once driver-side, inlined in the oracle as VALUES), so neither
engine ever evaluates ``ln`` at query time.  The large-range correction
remains out of scope (irrelevant at the 60-bit hash width: it corrects
hash saturation near 2^60).  ``n_empty_buckets`` is still emitted, and
the raw estimate stays available in ``est_distinct`` (``est_corrected``
carries the regime-switched value; ``regime`` names which fired).

Public knowledge: Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: hash width in bits (15 hex digits of md5 — signed-int64-safe)
_HASH_BITS = 60


def _alpha_micros(m: int) -> int:
    """The alpha_m bias-correction constant, micro-scaled: pinned by
    formula so the Spark side and any oracle agree on the same integer."""
    return round(0.7213 / (1.0 + 1.079 / m) * 1_000_000)


def hll_numerator(b: int, hash_bits: int = _HASH_BITS) -> int:
    """The constant integer numerator ``alpha_micros * m^2 * 2^R`` of
    the estimate — computed driver-side once (it exceeds int64; both
    engines receive it as a decimal literal)."""
    m = 1 << b
    r = hash_bits - b + 1
    return _alpha_micros(m) * m * m * (1 << r)


def linear_counting_estimates(b: int) -> list[tuple[int, int]]:
    """Pinned linear-counting table: ``(V, round(m·ln(m/V)))`` for every
    possible empty-bucket count ``V`` in 1..m.  Computed ONCE driver-side
    (Python's ``math.log`` — the constants are build-time pins, the same
    style as :func:`_alpha_micros`), so Spark and any oracle consume
    identical integers and the regime-switched estimate stays bit-exact
    cross-engine."""
    import math

    m = 1 << b
    return [(v, round(m * math.log(m / v))) for v in range(1, m + 1)]


def linear_counting_values_sql(b: int) -> str:
    """The same table as a SQL VALUES body (``(v, est), …``) for oracles."""
    return ", ".join(f"({v}, {e})" for v, e in linear_counting_estimates(b))


def hll_registers(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    b: int = 10,
    hash_bits: int = _HASH_BITS,
) -> DataFrame:
    """Per-group HLL registers ``(…group, bucket, m_j)``: the mergeable
    sketch state (merging = another max over bucket).  ``hash_bits=32``
    (8 hex digits of md5) is the classic FFGM width where the
    large-range saturation correction applies; 60 is this module's
    default (saturation unreachable)."""
    if not 4 <= b <= 16:
        raise ValueError(f"b={b} outside the sane 4..16 register range")
    if hash_bits % 4 != 0 or not b < hash_bits <= 60:
        raise ValueError(f"hash_bits={hash_bits} not a nibble width in range")
    rest_bits = hash_bits - b
    r = rest_bits + 1
    hv = F.conv(
        F.substring(
            F.md5(F.col(value_col).cast("string")), 1, hash_bits // 4
        ),
        16, 10,
    ).cast("long")
    # EXACT integer bucket split: a `/`-then-cast would route the 60-bit
    # hash through a double (53-bit mantissa) and misassign buckets near
    # boundaries — invisible at test scale, real at 10^12 rows
    bucket = F.shiftright(hv, rest_bits)
    rest = hv % (1 << rest_bits)
    rank = (
        F.when(rest == 0, F.lit(r))
        .otherwise(F.lit(rest_bits) - F.length(F.bin(rest)) + 1)
        .cast("int")
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("__rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rank").alias("m_j"))
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    b: int = 10,
    small_range_correction: bool = False,
    hash_bits: int = _HASH_BITS,
    large_range_correction: bool = False,
) -> DataFrame:
    """Per-group deterministic HLL distinct estimate:
    ``(…group, observed_buckets, n_empty_buckets, est_distinct)``.

    With ``small_range_correction=True``, two more columns:
    ``est_corrected`` (linear counting when the raw estimate is at or
    below 2.5·m with empty buckets — exact integer comparison
    ``2·est <= 5·m`` — else the raw estimate) and ``regime``
    (``'linear'``/``'raw'``).  The linear estimate joins the pinned
    :func:`linear_counting_estimates` table broadcast on V.
    ``large_range_correction=True`` (requires ``hash_bits=32``) adds the
    FFGM saturation correction — see
    :func:`hll_estimate_from_registers`."""
    regs = hll_registers(df, group_cols, value_col, b, hash_bits)
    return hll_estimate_from_registers(
        regs, group_cols, b,
        hash_bits=hash_bits,
        small_range_correction=small_range_correction,
        large_range_correction=large_range_correction,
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list,
    b: int = 10,
    hash_bits: int = _HASH_BITS,
    small_range_correction: bool = False,
    large_range_correction: bool = False,
) -> DataFrame:
    """Estimate from the mergeable register state ``(…group, bucket,
    m_j)`` — the entry point a warehouse actually uses at 100 TB
    (registers roll up across days/partitions with ``max``; the raw
    rows are long gone by estimation time).

    Large-range correction (FFGM 2007, 32-bit hashes): when
    ``E > 2^32/30`` the raw estimate saturates (hash collisions) and
    ``E* = -2^32·ln(1 - E/2^32)`` de-biases it.  To stay integer-exact
    cross-engine the curve enters as 256 PINNED knots
    (:func:`large_range_estimates`) with exact integer piecewise-linear
    interpolation between them — the same no-transcendentals-at-query-
    time discipline as the linear-counting table.  E is clamped into
    the last finite segment (k=254..255; the curve diverges at
    E = 2^32, where the sketch is saturated beyond repair anyway).
    ``regime`` gains the value ``'large'``."""
    m = 1 << b
    r = hash_bits - b + 1
    numer = hll_numerator(b, hash_bits)
    if large_range_correction and hash_bits != 32:
        raise ValueError(
            "large_range_correction applies to 32-bit hashes "
            f"(hash_bits={hash_bits})"
        )
    # sum(2^-M_j) scaled by 2^R: exact integer via shifts; empty buckets
    # contribute 2^R each.  decimal(38,0) — m * 2^R can reach 2^61 and
    # the 1e6-scaled denominator exceeds int64.
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("observed_buckets"),
        F.sum(
            F.expr(f"cast(shiftleft(1L, {r} - m_j) as decimal(38,0))")
        ).alias("__s"),
    )
    denom = (
        F.col("__s")
        + (F.lit(m) - F.col("observed_buckets"))
        * F.lit(1 << r).cast("decimal(38,0)")
    ) * F.lit(1_000_000).cast("decimal(38,0)")
    # `div` (integral division) keeps the estimate an EXACT floor — a
    # decimal `/` would round at scale 6 and a quotient landing in
    # (x.9999995, x+1) would floor to the wrong integer
    numer_col = F.lit(str(numer)).cast("decimal(38,0)")
    out = agg.select(
        *group_cols,
        F.col("observed_buckets").cast("long").alias("observed_buckets"),
        (F.lit(m) - F.col("observed_buckets"))
        .cast("long")
        .alias("n_empty_buckets"),
        numer_col.alias("__n"),
        denom.alias("__d"),
    ).select(
        *group_cols,
        "observed_buckets",
        "n_empty_buckets",
        F.expr("cast(__n div __d as bigint)").alias("est_distinct"),
    )
    if not small_range_correction and not large_range_correction:
        return out
    spark = regs.sparkSession
    est_corr = F.col("est_distinct")
    regime = F.lit("raw")
    if small_range_correction:
        lc = F.broadcast(
            spark.createDataFrame(
                linear_counting_estimates(b),
                "n_empty_buckets long, __lc long",
            )
        )
        out = out.join(lc, "n_empty_buckets", "left")
        is_linear = (F.col("n_empty_buckets") > 0) & (
            F.col("est_distinct") * 2 <= 5 * m
        )
        est_corr = F.when(is_linear, F.col("__lc")).otherwise(est_corr)
        regime = F.when(is_linear, F.lit("linear")).otherwise(regime)
    if large_range_correction:
        knots = large_range_estimates()
        lr = F.broadcast(
            spark.createDataFrame(
                [(k, c, knots[min(k + 1, 255)][1]) for k, c in knots],
                "__k long, __c0 long, __c1 long",
            )
        )
        two32 = 1 << 32
        seg = two32 >> 8  # 2^24 per knot segment
        is_large = F.col("est_distinct") * 30 > two32
        k_col = F.least(
            F.expr(f"est_distinct div {seg}").cast("long"), F.lit(255)
        )
        out = out.withColumn("__k", k_col).join(lr, "__k", "left")
        # exact integer lerp: c0 + (c1-c0) * (E - k*2^24) div 2^24
        lerp = F.expr(
            f"__c0 + (__c1 - __c0) * "
            f"(least(est_distinct, {two32 - 1}) - __k * {seg}) div {seg}"
        )
        # small-range takes precedence (regimes are disjoint: linear
        # fires below 2.5m, large above 2^32/30)
        already_linear = (
            regime == F.lit("linear")
            if small_range_correction
            else F.lit(False)
        )
        est_corr = F.when(
            is_large & ~already_linear, lerp.cast("long")
        ).otherwise(est_corr)
        regime = F.when(
            is_large & ~already_linear, F.lit("large")
        ).otherwise(regime)
    return out.select(
        *group_cols,
        "observed_buckets",
        "n_empty_buckets",
        "est_distinct",
        est_corr.cast("long").alias("est_corrected"),
        regime.alias("regime"),
    )


#: knot count for the pinned large-range curve (k = E div 2^24)
_LR_KNOTS = 256


def large_range_estimates() -> list[tuple[int, int]]:
    """Pinned large-range knots: ``(k, round(-2^32·ln(1 - k/256)))`` for
    k in 0..255 — computed once driver-side (build-time pins, the
    :func:`linear_counting_estimates` style).  k=255 is the last finite
    knot; estimates are clamped into its segment."""
    import math

    two32 = 1 << 32
    return [
        (k, round(-two32 * math.log(1.0 - k / _LR_KNOTS)))
        for k in range(_LR_KNOTS)
    ]


def large_range_values_sql() -> str:
    """``(k, c0, c1)`` VALUES rows for oracles (c1 = next knot,
    clamped at the last)."""
    knots = large_range_estimates()
    return ", ".join(
        f"({k}, {c}, {knots[min(k + 1, _LR_KNOTS - 1)][1]})"
        for k, c in knots
    )
