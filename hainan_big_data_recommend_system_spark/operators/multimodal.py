"""Multimodal column plumbing (north-star extension surface).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas functions over ``mapInPandas``:

    (id, media binary, media_type, meta…) → decode/extract → features

The decode kernels themselves are STUBBED — PIL/ffmpeg/torchaudio are not in
this container — behind an import-try that raises ``NotImplementedError``
with a clear message, plus a deterministic fake used by tests.  What IS real
and tested: the schema contract, the Arrow batch path, the partitioning
strategy, and the UDF signatures — the parts that matter for the Spark plan.

Scale notes: binary payloads make rows wide — ``maxPartitionBytes`` governs
scan parallelism, and feature extraction should run AFTER any filter that
can drop rows (predicate pushdown on the metadata columns; never decode
what you'll discard).  ``mapInPandas`` streams Arrow batches — peak memory
is one batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("source", T.StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "width int, height int, channels int, features array<float>"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_index int, frame_offset_bytes long, frame_digest string"
)


def _try_real_decode(payload: bytes):  # pragma: no cover - env-dependent
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not in this "
            "container — tests use the deterministic fake below"
        )


# ---------------------------------------------------------------------------
# Real decode path: BMP.  The format is self-describing enough to parse in
# pure Python, so `width`/`height`/`channels` for BMP payloads come from
# the PAYLOAD BYTES, not a fake — compressed formats (PNG/JPEG) still need
# Pillow and stay behind the `use_real_decoder` gate.
# ---------------------------------------------------------------------------


def parse_bmp_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a BITMAPINFOHEADER-style BMP: returns
    ``(width, height, bits_per_pixel, declared_file_size, pixel_offset)``.

    Validates the 'BM' magic, header length, and plane count; raises
    ``ValueError`` on anything malformed — a decode stage must reject
    corrupt payloads loudly, not emit garbage dimensions.  The pixel
    offset comes from header bytes 10–13 (it is NOT always 54: V4/V5 DIB
    headers and palettes push it out).
    """
    import struct

    if len(payload) < 54:
        raise ValueError(f"BMP too short: {len(payload)} bytes")
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    file_size, _, _, px_offset = struct.unpack_from("<IHHI", payload, 2)
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    if planes != 1:
        raise ValueError(f"BMP plane count must be 1, got {planes}")
    if width <= 0:
        raise ValueError(f"non-positive BMP width {width}")
    if not 14 + dib_size <= px_offset <= len(payload):
        raise ValueError(f"pixel offset {px_offset} outside payload")
    return width, abs(height), bpp, file_size, px_offset


def make_bmp(width: int, height: int, pixel_seed: bytes) -> bytes:
    """Build a VALID 24-bit BMP (BITMAPINFOHEADER, bottom-up, 4-byte row
    padding) with pixel data cycled from ``pixel_seed`` — the fixture
    generator for the decode path.  Pure function of its arguments, so the
    oracle can predict every header field the parser reads back."""
    import struct

    row_size = (width * 3 + 3) // 4 * 4
    pixel_bytes = row_size * height
    file_size = 54 + pixel_bytes
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    seed = pixel_seed or b"\x00"
    reps = -(-pixel_bytes // len(seed))
    return header + dib + (seed * reps)[:pixel_bytes]


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake dimensions from payload length alone — O(1)."""
    n = len(payload)
    return 16 + (n % 64), 16 + ((n // 64) % 64), 3


def _byte_hist(buf: bytes) -> list[float]:
    """Normalized 8-bin byte histogram over (at most) the first 4 KiB —
    the deterministic stand-in for a CNN embedding (same bytes → same
    features, any engine, any retry)."""
    hist = [0.0] * 8
    for b in buf[:4096]:
        hist[b & 7] += 1.0
    total = sum(hist) or 1.0
    return [h / total for h in hist]


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode keyed on payload bytes: stable dims and
    the byte-histogram features."""
    width, height, channels = _fake_dims(payload)
    return width, height, channels, _byte_hist(payload)


def _map_media_rows(
    media: DataFrame,
    row_fn,
    schema: str,
    media_type: str | None = None,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Shared Arrow-batch skeleton for per-payload kernels: optional
    media-type filter, repartition by ``media_id`` (a skewed ingest layout
    must not serialize the work), ``mapInPandas`` streaming (peak memory =
    one batch), and the real-decoder gate.  ``row_fn(media_id, payload,
    row) -> dict`` supplies the kernel output per row."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                if use_real_decoder:
                    _try_real_decode(payload)
                rows.append(row_fn(r["media_id"], payload, r))
            yield pd.DataFrame(rows)

    src = media
    if media_type is not None:
        src = src.filter(F.col("media_type") == media_type)
    return src.repartition("media_id").mapInPandas(batches, schema=schema)


def decode_image_features(
    media: DataFrame, use_real_decoder: bool = False
) -> DataFrame:
    """Decode + feature-extract over Arrow batches (``mapInPandas``).

    BMP payloads take the REAL path: dimensions/channel count are parsed
    from the payload's own header bytes (:func:`parse_bmp_header`).  Other
    formats need Pillow (``use_real_decoder`` gate) and otherwise fall to
    the deterministic fake.  Features are the byte-histogram stand-in for
    a CNN embedding in both paths.  Plumbing (filter/repartition/Arrow
    batches) lives in :func:`_map_media_rows`.
    """

    def row_fn(media_id, payload, r):
        # try the real parser on a BMP-shaped payload; a lookalike that
        # merely starts with 'BM' (text, random binary) must fall back to
        # the total fake path, not fail the task — one corrupt row never
        # kills a corpus decode
        parsed = None
        if payload[:2] == b"BM":
            try:
                parsed = parse_bmp_header(payload)
            except ValueError:
                parsed = None
        if parsed is not None:
            w, h, bpp, _, px_off = parsed
            c = max(bpp // 8, 1)
            feats = _byte_hist(payload[px_off:])  # pixel bytes only
        else:
            w, h, c, feats = _fake_decode(payload)
        return {
            "media_id": media_id,
            "media_type": r["media_type"],
            "n_bytes": len(payload),
            "width": w,
            "height": h,
            "channels": c,
            "features": feats,
        }

    return _map_media_rows(
        media, row_fn, IMAGE_FEATURES_SCHEMA, use_real_decoder=use_real_decoder
    )


def generate_bmp_media(
    docs: DataFrame, id_col: str, text_col: str, mod_w: int = 31, mod_h: int = 17
) -> DataFrame:
    """Fixture-payload generator: one valid 24-bit BMP per document, sized
    ``(1 + id % mod_w) × (1 + id % mod_h)`` with pixels cycled from the
    document text.  Runs distributed over Arrow batches; a pure function
    of (id, text), so an oracle can predict the header fields the decode
    stage parses back — which is exactly what makes the decode path
    testable without shipping image assets."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                did = int(r[id_col])
                rows.append(
                    {
                        "media_id": did,
                        "media_type": "image",
                        "payload": make_bmp(
                            1 + did % mod_w,
                            1 + did % mod_h,
                            str(r[text_col]).encode("utf-8"),
                        ),
                        "source": "synthetic-bmp",
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select(id_col, text_col).mapInPandas(batches, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_bytes: int = 1 << 16) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit one row per sampled
    offset (deterministic stride; a real implementation would seek keyframes).
    Pure column expressions — the explode shape is what a real frame sampler
    produces, one row per frame, partitioned by media_id."""
    n = F.length("payload").cast("long")
    n_frames = F.greatest((n / every_bytes).cast("int"), F.lit(1))
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias(
                "frame_index", "__f"
            ),
            n.alias("__n"),
        )
        .select(
            "media_id",
            "frame_index",
            (F.col("frame_index").cast("long") * every_bytes).alias(
                "frame_offset_bytes"
            ),
            F.md5(
                F.concat_ws(":", F.col("media_id"), F.col("frame_index")).cast(
                    "binary"
                )
            ).alias("frame_digest"),
        )
    )


RESIZED_SCHEMA = (
    "media_id long, src_width int, src_height int, "
    "dst_width int, dst_height int, resized binary, resize_digest string"
)


def _fake_resize(payload: bytes, dst_w: int, dst_h: int) -> bytes:
    """Deterministic fake resize: stride-sample the payload down to
    dst_w*dst_h bytes (stands in for pixel resampling; same payload and
    target dims → same bytes, any engine, any retry)."""
    target = max(dst_w * dst_h, 1)
    if len(payload) <= target:
        return payload
    stride = len(payload) // target
    return payload[::stride][:target]


def resize_bmp(payload: bytes, dst_w: int, dst_h: int) -> bytes:
    """REAL resize for 24-bit BMPs: nearest-neighbor resample of the
    actual pixel grid (row padding respected, bottom-up order preserved),
    re-encoded as a valid BMP of the target dimensions.  Pure function —
    deterministic under retry — and pure Python, so it runs without any
    image library.  Raises ``ValueError`` for non-24bpp inputs."""
    w, h, bpp, _, off = parse_bmp_header(payload)
    if bpp != 24:
        raise ValueError(f"resize_bmp handles 24bpp only, got {bpp}")
    src_row = (w * 3 + 3) // 4 * 4
    dst_row = (dst_w * 3 + 3) // 4 * 4
    need = off + src_row * h
    if len(payload) < need:
        raise ValueError(f"BMP pixel data truncated: {len(payload)} < {need}")
    out = bytearray(dst_row * dst_h)
    for y in range(dst_h):
        sy = y * h // dst_h
        src_base = off + sy * src_row
        dst_base = y * dst_row
        for x in range(dst_w):
            sx = x * w // dst_w
            s = src_base + sx * 3
            d = dst_base + x * 3
            out[d : d + 3] = payload[s : s + 3]
    import struct

    file_size = 54 + len(out)
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, dst_w, dst_h, 1, 24, 0, len(out), 2835, 2835, 0, 0
    )
    return header + dib + bytes(out)


def resize_images(
    media: DataFrame,
    dst_w: int = 64,
    dst_h: int = 64,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Resize over Arrow batches (``mapInPandas``).

    24-bit BMP payloads take the REAL path (:func:`resize_bmp`:
    nearest-neighbor resample of the actual pixel grid, re-encoded as a
    valid BMP); other formats fall back to the deterministic fake behind
    the Pillow gate.  Binary-in/binary-out schema, Arrow batch streaming,
    skew-safe repartition (shared skeleton :func:`_map_media_rows`), and a
    digest column so downstream dedup can run on resized outputs without
    re-reading payloads.
    """
    import hashlib

    def row_fn(media_id, payload, r):
        out = None
        if payload[:2] == b"BM":
            try:
                w, h, _, _, _ = parse_bmp_header(payload)
                out = resize_bmp(payload, dst_w, dst_h)
            except ValueError:
                out = None
        if out is None:
            w, h, _ = _fake_dims(payload)
            out = _fake_resize(payload, dst_w, dst_h)
        return {
            "media_id": media_id,
            "src_width": w,
            "src_height": h,
            "dst_width": dst_w,
            "dst_height": dst_h,
            "resized": out,
            "resize_digest": hashlib.md5(out).hexdigest(),
        }

    return _map_media_rows(
        media,
        row_fn,
        RESIZED_SCHEMA,
        media_type="image",
        use_real_decoder=use_real_decoder,
    )
