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

Scope note (documented, honest): this is the RAW HLL estimator — the
small-range (linear-counting) and large-range corrections are not
applied; the operator emits ``n_empty_buckets`` so a caller can detect
the small-range regime (estimate <= 2.5m with empty buckets) and fall
back to an exact count there.  The catalog query keeps cardinalities
inside the raw regime.

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


def hll_numerator(b: int) -> int:
    """The constant integer numerator ``alpha_micros * m^2 * 2^R`` of
    the estimate — computed driver-side once (it exceeds int64; both
    engines receive it as a decimal literal)."""
    m = 1 << b
    r = _HASH_BITS - b + 1
    return _alpha_micros(m) * m * m * (1 << r)


def hll_registers(
    df: DataFrame, group_cols: list, value_col: str, b: int = 10
) -> DataFrame:
    """Per-group HLL registers ``(…group, bucket, m_j)``: the mergeable
    sketch state (merging = another max over bucket)."""
    if not 4 <= b <= 16:
        raise ValueError(f"b={b} outside the sane 4..16 register range")
    rest_bits = _HASH_BITS - b
    r = rest_bits + 1
    hv = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
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
    df: DataFrame, group_cols: list, value_col: str, b: int = 10
) -> DataFrame:
    """Per-group deterministic HLL distinct estimate:
    ``(…group, observed_buckets, n_empty_buckets, est_distinct)``."""
    m = 1 << b
    r = _HASH_BITS - b + 1
    numer = hll_numerator(b)
    regs = hll_registers(df, group_cols, value_col, b)
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
    return agg.select(
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
