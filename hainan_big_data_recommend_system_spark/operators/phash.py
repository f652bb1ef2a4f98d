"""Perceptual-hash image near-dup (round 5) — connects the two flagship
surfaces: real image decode (operators/multimodal.py, operators/jpeg.py)
feeding the dedup ladder shape (operators/dedup.py: fingerprint →
bucket groupBy → candidate pairs → exact verify, never all-pairs).

Hashes are the classic dHash / aHash (public algorithms: difference /
average hash over a tiny grayscale thumbnail), specified here with
EXACT integer semantics so the whole chain is DuckDB-oracle-checkable
on the generated fixtures:

- thumbnail = NEAREST-NEIGHBOR samples on a (GRID+1)×GRID / GRID×GRID
  lattice (``sx = gx·w // nx``), not area averaging — deterministic and
  expressible as pure arithmetic over the reconstructed pixel stream;
- grayscale = integer BT.601 luma ``(77·r + 150·g + 29·b) >> 8``;
- dHash bit (y·8+x) = [luma(y,x) < luma(y,x+1)] over a 9×8 lattice;
- aHash bit (y·8+x) = [luma(y,x) > floor(mean of the 64 samples)].

Near-dup retrieval is hamming-LSH by BANDING, exactly the MinHash
band trick: split the 64-bit hash into ``bands`` equal slices; two
images sharing ANY band slice become a candidate pair; candidates are
scored with exact ``bit_count(a XOR b)`` and filtered to
``max_hamming``.  A pair at hamming distance d collides in some band
with probability ≥ 1 − (d/64·…) — band count is the recall knob, and
work is ∝ Σ band-bucket², never n².

100 TB shape: hashing is one map pass over decoded media (Arrow
batches); the band join shuffles (band_idx, band_val) longs; candidate
dedup carries two ids — the same shuffle discipline as operators/lsh.py.
No reference analogue; cites dHash/aHash as published by the pHash
project / Krawetz's "Kind of Like That" description (public knowledge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .multimodal import _map_media_rows, decode_any

PHASH_SCHEMA = "media_id long, dhash long, ahash long, width int, height int"


def _luma_grid(pixels: bytes, w: int, h: int, c: int, nx: int, ny: int):
    """Integer-luma samples on an ``nx × ny`` nearest-neighbor lattice."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8)
    if c >= 3:
        # BMP rows are 4-byte padded; PNG/JPEG are tightly packed.  The
        # caller passes the tight stream for PNG/JPEG and the padded
        # array for BMP — recover the row stride from the byte count.
        stride = len(arr) // h if h else 0
        rows = arr[: stride * h].reshape(h, stride)
        sx = (np.arange(nx) * w) // nx
        sy = (np.arange(ny) * h) // ny
        # BMP pixel order is BGR bottom-up, PNG/JPEG RGB top-down; luma
        # weights are near-symmetric but not equal, so callers flip BMP
        # rows/channels BEFORE calling (see phash_image_hashes).
        r = rows[np.ix_(sy, sx * c)].astype(np.int64)
        g = rows[np.ix_(sy, sx * c + 1)].astype(np.int64)
        b = rows[np.ix_(sy, sx * c + 2)].astype(np.int64)
        return (77 * r + 150 * g + 29 * b) >> 8
    rows = arr[: w * h].reshape(h, w)
    sx = (np.arange(nx) * w) // nx
    sy = (np.arange(ny) * h) // ny
    return rows[np.ix_(sy, sx)].astype(np.int64)


def dhash64(pixels: bytes, w: int, h: int, c: int) -> int:
    """64-bit difference hash: bit ``y·8+x`` set iff the luma at lattice
    column x is strictly less than at column x+1 (9 columns × 8 rows)."""
    g = _luma_grid(pixels, w, h, c, 9, 8)
    bits = g[:, :-1] < g[:, 1:]
    return _pack_bits(bits)


def ahash64(pixels: bytes, w: int, h: int, c: int) -> int:
    """64-bit average hash: bit set iff the sample's luma exceeds the
    floor-mean of all 64 samples (8 × 8 lattice, integer mean)."""
    g = _luma_grid(pixels, w, h, c, 8, 8)
    mean = int(g.sum()) // 64
    return _pack_bits(g > mean)


def _pack_bits(bits) -> int:
    v = 0
    flat = bits.flatten()
    for i in range(64):
        if flat[i]:
            v |= 1 << i
    return v


def phash_image_hashes(media: DataFrame) -> DataFrame:
    """Per-image perceptual hashes over Arrow batches:
    ``(media_id, dhash, ahash, width, height)``.  Rows whose payload
    does not decode (no real parser claims it) are DROPPED — a hash of
    undecodable bytes is noise, not signal."""

    def row_fn(media_id, payload, r):
        decoded = decode_any(payload)
        if decoded is None:
            return None
        w, h, c, pixels = decoded
        if payload[:2] == b"BM" and c >= 3:
            # normalize BMP to the PNG/JPEG convention (top-down RGB):
            # flip rows (BMP is bottom-up) and swap B/R (BGR order)
            import numpy as np

            stride = (w * c + 3) // 4 * 4
            arr = np.frombuffer(pixels[: stride * h], dtype=np.uint8)
            rows = arr.reshape(h, stride)[::-1, : w * c].reshape(h, w, c)
            pixels = rows[..., ::-1].tobytes()
        return {
            "media_id": media_id,
            "dhash": _to_i64(dhash64(pixels, w, h, c)),
            "ahash": _to_i64(ahash64(pixels, w, h, c)),
            "width": w,
            "height": h,
        }

    return _map_media_rows(media, row_fn, PHASH_SCHEMA)


def _to_i64(v: int) -> int:
    """Wrap an unsigned 64-bit hash into Spark's signed LongType."""
    return v - (1 << 64) if v >= (1 << 63) else v


def phash_neardup_pairs(
    hashes: DataFrame,
    hash_col: str = "dhash",
    id_col: str = "media_id",
    bands: int = 8,
    max_hamming: int = 10,
) -> DataFrame:
    """Banded hamming near-dup pairs: ``(image_a, image_b, hamming)``
    with ``image_a < image_b``, exact ``bit_count`` distance ≤
    ``max_hamming``, candidates only from shared band slices (work ∝
    Σ band-bucket², the MinHash-LSH discipline — never an n² cross)."""
    if 64 % bands:
        raise ValueError(f"bands={bands} must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    h = hashes.select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
    )
    slices = h.select(
        "__id",
        "__h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("__h"), i * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("val"),
                )
                for i in range(bands)
            ])
        ).alias("s"),
    ).select("__id", "__h", F.col("s.band").alias("band"), F.col("s.val").alias("val"))
    a = slices.select(
        F.col("__id").alias("image_a"), F.col("__h").alias("__ha"), "band", "val"
    )
    b = slices.select(
        F.col("__id").alias("image_b"), F.col("__h").alias("__hb"), "band", "val"
    )
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("image_a") < F.col("image_b"))
        .select("image_a", "image_b", "__ha", "__hb")
        .dropDuplicates(["image_a", "image_b"])
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.select(
            "image_a", "image_b", ham.cast("int").alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
    )
