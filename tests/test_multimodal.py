"""Multimodal tests: binary columns flow through Arrow batches with a
stable schema; BMP and PNG decode for REAL in pure Python (header parse /
CRC + inflate + unfilter); frame sampling explodes correctly; everything
else falls back to the deterministic fake (JPEG et al. need Pillow, which
isn't in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.catalog import load_table
from hainan_big_data_recommend_system_spark.operators.multimodal import (
    decode_image_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "video").otherwise("image").alias(
            "media_type"
        ),
        F.col("text").cast("binary").alias("payload"),
        F.col("source").alias("source"),
    ).cache()


def test_decode_schema_and_determinism(spark, media):
    out1 = decode_image_features(media)
    assert out1.schema.simpleString() == (
        "struct<media_id:bigint,media_type:string,n_bytes:bigint,"
        "width:int,height:int,channels:int,features:array<float>,"
        "px_md5:string>"
    )
    r1 = {r["media_id"]: (r["width"], r["height"], tuple(r["features"])) for r in out1.collect()}
    r2 = {
        r["media_id"]: (r["width"], r["height"], tuple(r["features"]))
        for r in decode_image_features(media).collect()
    }
    assert r1 == r2  # deterministic across runs (retry-safe)
    assert len(r1) == media.count()
    # features are normalized histograms
    for _, (_, _, feats) in r1.items():
        assert abs(sum(feats) - 1.0) < 1e-5


def test_real_decoder_stub_raises(spark, media):
    with pytest.raises(Exception) as exc_info:
        decode_image_features(media.limit(1), use_real_decoder=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or "Pillow" in str(
        exc_info.value
    )


def test_frame_sampling(spark, media):
    frames = sample_frames(media, every_bytes=128)
    rows = frames.collect()
    assert len(rows) > 0
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    videos = {r["media_id"] for r in media.filter("media_type = 'video'").collect()}
    assert set(by_media) == videos  # only video rows explode
    for mid, fr in by_media.items():
        idxs = sorted(f["frame_index"] for f in fr)
        assert idxs == list(range(len(idxs)))  # dense frame indexes
        assert all(f["frame_offset_bytes"] == f["frame_index"] * 128 for f in fr)


def test_resize_schema_and_determinism(spark, media):
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        resize_images,
    )

    out = resize_images(media, dst_w=8, dst_h=8)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,src_width:int,src_height:int,"
        "dst_width:int,dst_height:int,resized:binary,resize_digest:string>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    # only images pass through, every resized payload fits the target
    n_images = media.filter(F.col("media_type") == "image").count()
    assert len(rows) == n_images
    assert all(len(bytes(r["resized"])) <= 64 for r in rows.values())
    # deterministic: a second run yields identical digests
    again = {
        r["media_id"]: r["resize_digest"]
        for r in resize_images(media, dst_w=8, dst_h=8).collect()
    }
    assert again == {k: r["resize_digest"] for k, r in rows.items()}


# ---------------------------------------------------------------------------
# Real BMP decode path (round 2): generated payloads are valid BMPs whose
# header fields the parser reads back exactly; malformed input is rejected.
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_and_rejection():
    import struct

    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        make_bmp,
        parse_bmp_header,
    )

    for w, h, seed in [(1, 1, b"x"), (31, 17, b"hello world"), (13, 5, b"")]:
        payload = make_bmp(w, h, seed)
        pw, ph, bpp, fsize, px_off = parse_bmp_header(payload)
        assert (pw, ph, bpp, px_off) == (w, h, 24, 54)
        assert fsize == len(payload) == 54 + (w * 3 + 3) // 4 * 4 * h

    # the parser reads the BYTES: patch the width field in place and the
    # parsed width must follow the corruption, not any id-based formula
    payload = bytearray(make_bmp(10, 4, b"seed"))
    struct.pack_into("<i", payload, 18, 23)
    assert parse_bmp_header(bytes(payload))[0] == 23

    with pytest.raises(ValueError):
        parse_bmp_header(b"PNG" + b"\x00" * 60)  # wrong magic
    with pytest.raises(ValueError):
        parse_bmp_header(b"BM\x00")  # truncated
    with pytest.raises(ValueError):
        bad = bytearray(make_bmp(4, 4, b"x"))
        struct.pack_into("<I", bad, 10, 10_000)  # pixel offset past payload
        parse_bmp_header(bytes(bad))


def test_decode_falls_back_on_bmp_lookalike(spark):
    """A payload that merely STARTS with 'BM' (text, random bytes) must go
    down the fake path, not fail the task — one corrupt row never kills a
    corpus decode."""
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        _fake_dims,
        decode_image_features,
    )

    lookalike = b"BMW dealership reviews, volume 7: " + b"\x01\x02" * 40
    media = spark.createDataFrame(
        [(1, "image", bytearray(lookalike), "s")],
        "media_id long, media_type string, payload binary, source string",
    )
    row = decode_image_features(media).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == _fake_dims(lookalike)


def test_decode_uses_real_bmp_header(spark, sf_dir):
    """Dims of valid generated BMPs must come from the payload bytes via
    the parser (generator-formula agreement end-to-end)."""
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        decode_image_features,
        generate_bmp_media,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = generate_bmp_media(docs, "doc_id", "text")
    out = {
        r["media_id"]: r
        for r in decode_image_features(media).collect()
    }
    for did, r in out.items():
        assert r["width"] == 1 + did % 31
        assert r["height"] == 1 + did % 17
        assert r["channels"] == 3
        assert r["n_bytes"] == 54 + (r["width"] * 3 + 3) // 4 * 4 * r["height"]


# ---------------------------------------------------------------------------
# Real PNG decode path (round 4): CRC-validated chunk walk, zlib inflate,
# scanline unfilter incl. Paeth.  The encoder is pinned against BY-HAND
# filter arithmetic (not just roundtrip, which a symmetric encoder/decoder
# bug could survive); the decoder against the roundtrip + the DuckDB oracle
# on px_md5 (qcatalog `multimodal_meta`).
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filters():
    import hashlib

    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        make_png,
        parse_png,
    )

    for w, h, seed in [(1, 1, b"x"), (29, 13, b"some document text"), (7, 11, b"")]:
        payload = make_png(w, h, seed)
        pw, ph, c, px = parse_png(payload)
        s = seed or b"\x00"
        n = w * h * 3
        want = (s * (-(-n // len(s))))[:n]
        assert (pw, ph, c) == (w, h, 3)
        assert px == want  # decode inverts filter 0..4 exactly
        assert hashlib.md5(px).hexdigest() == hashlib.md5(want).hexdigest()


def test_png_filtered_bytes_pinned_by_hand():
    """The encoder's filtered scanlines match spec arithmetic computed BY
    HAND for a 1x5 image (one scanline per filter type): Sub with no left
    neighbor, Up as row delta, Average as floor((a+b)/2), Paeth choosing
    the `up` predictor when a=c=0.  This breaks the symmetry of the
    roundtrip test — a matching encode/decode bug pair cannot pass it."""
    import struct
    import zlib

    from hainan_big_data_recommend_system_spark.operators.multimodal import make_png

    seed = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120, 130, 140, 150])
    payload = make_png(1, 5, seed)
    # IDAT is the second chunk: sig(8) + IHDR chunk (12+13) = offset 33
    clen = struct.unpack_from(">I", payload, 33)[0]
    assert payload[37:41] == b"IDAT"
    raw = zlib.decompress(payload[41 : 41 + clen])
    expect = bytes(
        [0, 10, 20, 30]        # y0 None
        + [1, 40, 50, 60]      # y1 Sub   (left = 0)
        + [2, 30, 30, 30]      # y2 Up    (row2 - row1)
        + [3, 65, 70, 75]      # y3 Avg   (100-35, 110-40, 120-45)
        + [4, 30, 30, 30]      # y4 Paeth (predictor = up = row3)
    )
    assert raw == expect


def test_png_rejects_corruption():
    import struct

    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        make_png,
        parse_png,
    )

    good = make_png(5, 4, b"seed")
    with pytest.raises(ValueError, match="signature"):
        parse_png(b"\x89PNX" + good[4:])
    # a cut INSIDE a chunk's trailing CRC field must raise ValueError too,
    # never struct.error — decode_image_features' corrupt-row fallback
    # catches only ValueError (code-review r4 finding)
    with pytest.raises(ValueError, match="truncated"):
        parse_png(good[: 8 + 8 + 13 + 2])  # sig + IHDR header+data + 2 CRC bytes
    bad_crc = bytearray(good)
    bad_crc[20] ^= 0xFF  # flip an IHDR byte without fixing its CRC
    with pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(bad_crc))
    # declared dims inconsistent with pixel data (CRC re-stamped so the
    # failure is the size check, not the checksum)
    bad_dim = bytearray(good)
    struct.pack_into(">I", bad_dim, 16, 9)  # width 5 -> 9 inside IHDR
    import zlib

    crc = zlib.crc32(bytes(bad_dim[12:29])) & 0xFFFFFFFF
    struct.pack_into(">I", bad_dim, 29, crc)
    with pytest.raises(ValueError, match="inflated size"):
        parse_png(bytes(bad_dim))


def test_png_zip_bomb_bounded(monkeypatch):
    """ADVICE r4: an IDAT that inflates far past the IHDR-derived bound
    (small declared dims, highly-compressed multi-MB stream) must raise
    ValueError from the bounded inflater — never materialize the full
    decompressed payload (executor-OOM vector on a corpus decode)."""
    import struct
    import zlib

    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        PNG_SIG,
        parse_png,
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # IHDR declares 1x1 grayscale (expected inflate: 2 bytes) but IDAT
    # holds 32 MB of zeros compressed to ~32 KB — all chunk CRCs valid
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (32 * 1024 * 1024), 9)
    payload = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")

    seen = {}
    real = zlib.decompressobj

    def spying_decompressobj(*a, **k):
        d = real(*a, **k)

        class Wrap:
            def decompress(self, data, max_length=0):
                out = d.decompress(data, max_length)
                seen["out_len"] = len(out)
                return out

            def __getattr__(self, name):
                return getattr(d, name)

        return Wrap()

    monkeypatch.setattr(zlib, "decompressobj", spying_decompressobj)
    with pytest.raises(ValueError, match="inflates past"):
        parse_png(payload)
    # the inflater was length-capped: output stopped at bound+1, not 32 MB
    assert seen["out_len"] <= 3


def test_decode_uses_real_png_pixels(spark, sf_dir):
    """Dims AND pixel digest of generated PNGs must come from actually
    decoding the payload (generator-formula agreement end-to-end)."""
    import hashlib

    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        decode_image_features,
        generate_png_media,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    media = generate_png_media(docs, "doc_id", "text")
    out = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert set(out) == set(texts)
    for did, r in out.items():
        w, h = 1 + did % 29, 1 + did % 13
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        tb = texts[did].encode("utf-8")
        n = w * h * 3
        want = (tb * (-(-n // len(tb))))[:n]
        assert r["px_md5"] == hashlib.md5(want).hexdigest()


def test_decode_falls_back_on_png_lookalike(spark):
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        _fake_dims,
        decode_image_features,
    )

    lookalike = b"\x89PNG\r\n\x1a\n" + b"this is not a real chunk stream"
    media = spark.createDataFrame(
        [(1, "image", bytearray(lookalike), "s")],
        "media_id long, media_type string, payload binary, source string",
    )
    row = decode_image_features(media).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == _fake_dims(lookalike)


def test_resize_bmp_real_resample():
    """resize_bmp reads the ACTUAL pixel grid: a 2x2 BMP with distinct
    corner colors downsampled to 1x1 must carry the bottom-left source
    pixel (nearest-neighbor, BMP rows are bottom-up), and the output is
    itself a valid BMP of the target dims."""
    import struct

    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        make_bmp,
        parse_bmp_header,
        resize_bmp,
    )

    # hand-build a 2x2 24bpp BMP with known pixels (BGR):
    # storage row 0 = bottom row: (1,1,1) (2,2,2); row 1 = top: (3,3,3) (4,4,4)
    row = bytes([1, 1, 1, 2, 2, 2, 0, 0])  # 2px * 3B + 2B pad
    top = bytes([3, 3, 3, 4, 4, 4, 0, 0])
    pixels = row + top
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    src = header + dib + pixels

    out = resize_bmp(src, 1, 1)
    w, h, bpp, fsize, off = parse_bmp_header(out)
    assert (w, h, bpp) == (1, 1, 24) and fsize == len(out)
    assert out[off : off + 3] == bytes([1, 1, 1])  # bottom-left source pixel

    # upsample: every sampled pixel must come from the source grid
    up = resize_bmp(src, 4, 2)
    uw, uh, _, _, uoff = parse_bmp_header(up)
    assert (uw, uh) == (4, 2)
    urow = (4 * 3 + 3) // 4 * 4
    bottom = [tuple(up[uoff + i * 3 : uoff + i * 3 + 3]) for i in range(4)]
    assert bottom == [(1, 1, 1), (1, 1, 1), (2, 2, 2), (2, 2, 2)]

    # generated BMPs round-trip through resize too
    g = make_bmp(10, 6, b"pattern")
    rg = resize_bmp(g, 5, 3)
    assert parse_bmp_header(rg)[:2] == (5, 3)


def test_resize_images_takes_real_path_for_bmp(spark, sf_dir):
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        generate_bmp_media,
        parse_bmp_header,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = generate_bmp_media(docs, "doc_id", "text")
    out = resize_images(media, dst_w=8, dst_h=8).collect()
    assert len(out) == 10
    for r in out:
        assert r["src_width"] == 1 + r["media_id"] % 31  # real header dims
        w, h, bpp, _, _ = parse_bmp_header(bytes(r["resized"]))
        assert (w, h, bpp) == (8, 8, 24)  # output is a valid 8x8 BMP


def test_multimodal_meta_oracle_handles_empty_text(spark, tmp_path):
    """ADVICE r4: an empty document must not divide the oracle's repeat
    count by zero — both engines fall back to a NUL pixel seed (the
    generator's `pixel_seed or b"\\x00"`), so the png_px_md5 facet still
    hash-matches on such a row."""
    import duckdb

    from hainan_big_data_recommend_system_spark.qcatalog import REGISTRY
    from tests.oracle_utils import compare

    sf = str(tmp_path / "sf_empty")
    spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x")], "doc_id long, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    spec = REGISTRY["multimodal_meta"]
    compare(spec.fn(spark, sf), con, spec.oracle, "multimodal_meta[empty-text]")
