"""Baseline-JPEG codec tests (operators/jpeg.py, round 5): the encoder is
a pure function (fixture generator), the decoder reads REAL tables from
the stream's own DQT/DHT segments, and the DCT roundtrip is pinned by a
tight max-abs pixel tolerance (IDCT rounding makes bit-exact digests
brittle — dims/channels are instead pinned exactly by the DuckDB oracle
in qcatalog multimodal_meta)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hainan_big_data_recommend_system_spark.operators.jpeg import (
    make_jpeg,
    parse_jpeg,
)


def _src_rgb(w: int, h: int, seed: bytes) -> np.ndarray:
    s = seed or b"\x00"
    n = w * h * 3
    raw = (s * (-(-n // len(s))))[:n]
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(np.int16)


def test_roundtrip_dims_channels_and_pixel_tolerance():
    for w, h, seed in [
        (1, 1, b"x"),
        (8, 8, b"hello world"),
        (23, 11, b"some document text"),
        (16, 9, b""),  # empty seed -> NUL fallback, exercises padding
        (9, 16, bytes(range(256))),  # full byte range through the DCT
        (24, 8, b"edge-aligned"),
    ]:
        payload = make_jpeg(w, h, seed)
        pw, ph, c, px = parse_jpeg(payload)
        assert (pw, ph, c) == (w, h, 3)
        got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(np.int16)
        err = int(np.abs(_src_rgb(w, h, seed) - got).max())
        # flat quant tables: error is IDCT/colorspace rounding only
        assert err <= 3, f"{w}x{h}: max abs pixel error {err} > 3"


def test_grayscale_stream_decodes():
    payload = make_jpeg(10, 7, b"gray test", gray=True)
    w, h, c, px = parse_jpeg(payload)
    assert (w, h, c) == (10, 7, 1)
    assert len(px) == 70
    # luma of the cycled seed, within rounding tolerance
    src = _src_rgb(10, 7, b"gray test").astype(np.float64)
    y = 0.299 * src[..., 0] + 0.587 * src[..., 1] + 0.114 * src[..., 2]
    got = np.frombuffer(px, dtype=np.uint8).reshape(7, 10).astype(np.float64)
    assert np.abs(y - got).max() <= 3


def test_encoder_deterministic():
    assert make_jpeg(23, 11, b"abc") == make_jpeg(23, 11, b"abc")


def test_decoder_uses_stream_tables_not_assumptions():
    """Doubling the DQT entries in the file (and nothing else) must
    change the decoded pixels accordingly — proof the decoder dequantizes
    with the STREAM's table, not a hardcoded one.  A doubled flat table
    roughly halves then re-doubles coefficients, so pixels stay within a
    coarser but bounded error."""
    payload = bytearray(make_jpeg(8, 8, b"table probe"))
    # find the two DQT segments (FF DB) and double every entry <= 127
    pos = 0
    found = 0
    while True:
        i = payload.find(b"\xff\xdb", pos)
        if i < 0:
            break
        seglen = struct.unpack_from(">H", payload, i + 2)[0]
        for j in range(i + 5, i + 2 + seglen):
            payload[j] = min(payload[j] * 2, 255)
        found += 1
        pos = i + 2 + seglen
    assert found == 2
    w, h, c, px = parse_jpeg(bytes(payload))
    assert (w, h, c) == (8, 8, 3)
    got = np.frombuffer(px, dtype=np.uint8).reshape(8, 8, 3).astype(np.int16)
    # doubling every dequant step doubles the reconstructed (signal-128)
    # amplitude, and YCbCr->RGB is affine, so the decode must land on
    # clip(2*src - 128) within rounding — a decoder ignoring the stream's
    # DQT would instead reproduce src exactly
    ref = parse_jpeg(make_jpeg(8, 8, b"table probe"))[3]
    assert px != ref
    expected = np.clip(2 * _src_rgb(8, 8, b"table probe") - 128, 0, 255)
    assert int(np.abs(expected - got).max()) <= 6


def test_rejects_out_of_scope_and_corrupt():
    good = make_jpeg(8, 8, b"seed")
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg(b"\x89PNG" + good)
    # progressive SOF2 must be rejected, not mis-decoded
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        parse_jpeg(prog)
    # truncated entropy stream (cut before EOI)
    with pytest.raises(ValueError, match="EOI|exhausted"):
        parse_jpeg(good[:-20])
    # chroma subsampling out of documented scope: patch SOF h/v for Y
    sub = bytearray(good)
    i = sub.find(b"\xff\xc0")
    sub[i + 2 + 2 + 6 + 1] = 0x22  # first component h=v=2
    with pytest.raises(ValueError, match="subsampling"):
        parse_jpeg(bytes(sub))
    # restart intervals: inject a DRI segment with interval 2 before SOS
    j = good.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x02"
    with pytest.raises(ValueError, match="restart"):
        parse_jpeg(good[:j] + dri + good[j:])
    # undefined Huffman table: strip the DHT segments
    k = good.find(b"\xff\xc4")
    stripped = bytearray(good)
    while True:
        k = stripped.find(b"\xff\xc4")
        if k < 0:
            break
        seglen = struct.unpack_from(">H", stripped, k + 2)[0]
        del stripped[k : k + 2 + seglen]
    with pytest.raises(ValueError, match="undefined DHT"):
        parse_jpeg(bytes(stripped))


def test_decode_image_features_takes_real_jpeg_path(spark, sf_dir):
    """End-to-end through the Arrow dispatch: generated JPEG payloads
    must decode to the doc_id-formula dimensions via the REAL parser."""
    from hainan_big_data_recommend_system_spark.catalog import load_table
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        decode_image_features,
        generate_jpeg_media,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = generate_jpeg_media(docs, "doc_id", "text")
    out = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert len(out) == 20
    for did, r in out.items():
        assert r["width"] == 1 + did % 23
        assert r["height"] == 1 + did % 11
        assert r["channels"] == 3


def test_jpeg_lookalike_falls_back(spark):
    """A payload that merely starts with FFD8 (random bytes) must go down
    the fake path, not fail the task."""
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        _fake_dims,
        decode_image_features,
    )

    lookalike = b"\xff\xd8 not actually a jpeg" + b"\x07\x03" * 30
    media = spark.createDataFrame(
        [(1, "image", bytearray(lookalike), "s")],
        "media_id long, media_type string, payload binary, source string",
    )
    row = decode_image_features(media).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == _fake_dims(lookalike)
