"""Geohash cells and cell-bucketed nearest-neighbor joins.

Geohash (Niemeyer 2008; the public geohash.org scheme) is a Morton
interleave over quantized (lon, lat) — longitude takes the even bit
positions starting at the MSB — base32-encoded 5 bits per character.
It is the standard spatial bucketing key: equal prefixes ⇒ nearby
boxes, so a prefix groupBy turns an all-pairs spatial join into
cell-local work (the same data-skipping idea as operators/zorder.py,
which this module shares its exactness discipline with).

Everything is integer micro-degrees end-to-end: quantization uses
``div`` integer division (never ``/`` through DOUBLE — the zorder.py
lesson), distances are squared-euclidean in micro-degrees (exact
int64: (3.6e8)² · 2 < 2⁶³), and the Spark Column and the oracle SQL
for the interleave are generated from ONE loop so the two spellings
cannot drift.

Semantics note for the kNN join: bucketing by a geohash prefix finds
neighbors WITHIN a cell — a true neighbor just across a cell boundary
is missed, exactly like any LSH bucket join here (ann_topk_lsh).  The
standard scale remedies (search the 8 adjacent cells, or two offset
grids) compose from the same primitives; the catalog query pins the
single-cell contract and the oracle enforces precisely that.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_LAT_SPAN = 180_000_000  # micro-degrees
_LON_SPAN = 360_000_000


def _bit_counts(chars: int) -> tuple[int, int]:
    if not 1 <= chars <= 12:  # 12 chars = 60 bits, the int64 ceiling
        raise ValueError("geohash precision must be 1..12 characters")
    total = 5 * chars
    lon_bits = (total + 1) // 2  # lon leads (even positions from MSB)
    return lon_bits, total - lon_bits


def quantize_col(v: Column, offset: int, span: int, bits: int) -> Column:
    """Integer cell index in [0, 2^bits): ((v + offset) << bits) div
    span, clamped at the top edge.  The division goes through the
    remainder identity ((raw - raw % span) / span): the numerator is an
    exact multiple of span, so the DOUBLE quotient is an integer well
    under 2^53 and cannot round across a cell boundary (the
    histogram_quantiles `div` lesson, spelled in the DataFrame API)."""
    raw = ((v + F.lit(offset)).cast("long") * F.lit(1 << bits))
    idx = ((raw - (raw % F.lit(span))) / F.lit(span)).cast("long")
    # clamp BOTH edges: out-of-domain coordinates (bad GPS fixes are
    # routine in real data) must land in an edge cell, not take bit
    # ops through a negative index
    return F.greatest(F.lit(0), F.least(idx, F.lit((1 << bits) - 1)))


def geohash_col(lat_micro: Column, lon_micro: Column, chars: int) -> Column:
    """The geohash string of integer micro-degree coordinates."""
    lon_bits, lat_bits = _bit_counts(chars)
    qlon = quantize_col(lon_micro, _LON_SPAN // 2, _LON_SPAN, lon_bits)
    qlat = quantize_col(lat_micro, _LAT_SPAN // 2, _LAT_SPAN, lat_bits)
    total = 5 * chars
    code = F.lit(0).cast("long")
    li = lon_bits
    ti = lat_bits
    for pos in range(total):  # pos 0 = MSB of the geohash code
        if pos % 2 == 0:
            li -= 1
            bit = F.shiftright(qlon, li).bitwiseAND(F.lit(1))
        else:
            ti -= 1
            bit = F.shiftright(qlat, ti).bitwiseAND(F.lit(1))
        code = code + F.shiftleft(bit, total - 1 - pos)
    alphabet = F.array(*[F.lit(c) for c in _BASE32])
    parts = []
    for i in range(chars):
        digit = F.shiftright(code, 5 * (chars - 1 - i)).bitwiseAND(F.lit(31))
        parts.append(F.element_at(alphabet, (digit + 1).cast("int")))
    return F.concat(*parts)


def geohash_sql(lat_expr: str, lon_expr: str, chars: int) -> str:
    """The identical geohash as ANSI SQL text, generated from the same
    bit walk (oracle side).  ``lat_expr``/``lon_expr`` are integer
    micro-degree SQL expressions."""
    lon_bits, lat_bits = _bit_counts(chars)

    def q(expr: str, off: int, span: int, bits: int) -> str:
        return (
            f"greatest(0, least((CAST({expr} AS BIGINT) + {off})"
            f" * {1 << bits} // {span}, {(1 << bits) - 1}))"
        )

    qlon = q(lon_expr, _LON_SPAN // 2, _LON_SPAN, lon_bits)
    qlat = q(lat_expr, _LAT_SPAN // 2, _LAT_SPAN, lat_bits)
    total = 5 * chars
    terms = []
    li = lon_bits
    ti = lat_bits
    for pos in range(total):
        if pos % 2 == 0:
            li -= 1
            src, sh = qlon, li
        else:
            ti -= 1
            src, sh = qlat, ti
        terms.append(f"((({src}) >> {sh} & 1) << {total - 1 - pos})")
    code = "(" + " + ".join(terms) + ")"
    chunks = [
        f"substr('{_BASE32}', cast(({code} >> {5 * (chars - 1 - i)} & 31)"
        f" + 1 AS INTEGER), 1)"
        for i in range(chars)
    ]
    return "concat(" + ", ".join(chunks) + ")"
