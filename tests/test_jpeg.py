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
    assert make_jpeg(19, 21, b"abc", subsampling="420") == make_jpeg(
        19, 21, b"abc", subsampling="420"
    )


def _expected_420(w: int, h: int, seed: bytes) -> np.ndarray:
    """Analytic 4:2:0 roundtrip expectation: YCbCr, edge-pad to 16×16
    MCUs, 2×2 box-average chroma, nearest-neighbor upsample, RGB —
    exactly the lossy part of the codec, so the decode must land on this
    within DCT-rounding tolerance."""
    from hainan_big_data_recommend_system_spark.operators.jpeg import (
        _edge_pad,
        _rgb_to_ycbcr,
        _ycbcr_to_rgb,
    )

    ycc = _rgb_to_ycbcr(_src_rgb(w, h, seed).astype(np.uint8))
    mcux, mcuy = -(-w // 16), -(-h // 16)
    padded = _edge_pad(ycc, mcuy * 16, mcux * 16)
    out = np.empty((h, w, 3))
    out[..., 0] = padded[:h, :w, 0]
    for c in (1, 2):
        half = padded[..., c].reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        out[..., c] = np.repeat(np.repeat(half, 2, axis=0), 2, axis=1)[:h, :w]
    return _ycbcr_to_rgb(out).astype(np.int16)


def test_420_roundtrip_matches_analytic_subsampling():
    """4:2:0 exercises the interleaved MCU walk (4 Y + Cb + Cr per MCU),
    multi-MCU grids, odd-dimension chroma edges, and the upsample path;
    pixels must match the box-downsample/nearest-upsample expectation
    within the same DCT tolerance the 4:4:4 path pins."""
    for w, h, seed in [
        (1, 1, b"x"),
        (8, 8, b"hello world"),
        (16, 16, b"one full mcu"),
        (19, 21, b"some document text"),  # 2x2 MCUs, odd edges
        (17, 9, bytes(range(256))),  # full byte range
        (32, 16, b"edge-aligned"),
        (5, 3, b""),  # empty seed -> NUL fallback
    ]:
        payload = make_jpeg(w, h, seed, subsampling="420")
        pw, ph, c, px = parse_jpeg(payload)
        assert (pw, ph, c) == (w, h, 3)
        got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(np.int16)
        err = int(np.abs(_expected_420(w, h, seed) - got).max())
        assert err <= 3, f"{w}x{h}: max abs pixel error {err} > 3"


def test_420_luma_is_not_subsampled():
    """Luma must come through at full resolution: on a grayscale-content
    image (r=g=b so chroma is flat), 4:2:0 and 4:4:4 decodes must agree
    to within rounding — subsampling may only touch chroma."""
    w, h = 19, 13
    seed = bytes(b * 3 for b in range(64) for _ in (0, 1, 2))[: w * h * 3]
    # build an r=g=b source: encode from a seed whose RGB triples repeat
    gray_seed = b"".join(bytes([b, b, b]) for b in range(97, 119))
    p444 = parse_jpeg(make_jpeg(w, h, gray_seed))[3]
    p420 = parse_jpeg(make_jpeg(w, h, gray_seed, subsampling="420"))[3]
    a = np.frombuffer(p444, dtype=np.uint8).astype(np.int16)
    b = np.frombuffer(p420, dtype=np.uint8).astype(np.int16)
    assert int(np.abs(a - b).max()) <= 2


def test_420_phash_near_dup_across_subsampling():
    """The phash near-dup ladder must treat a 4:2:0 re-encode of the
    same source as a near-duplicate: dHash/aHash over the decoded pixels
    of both encodings agree within a few bits (they are luma-driven, and
    luma is full-resolution in both layouts)."""
    from hainan_big_data_recommend_system_spark.operators.phash import (
        ahash64,
        dhash64,
    )

    for w, h in [(48, 32), (19, 21)]:
        # full-image seed (cycling is identity): a luma gradient with
        # real spatial structure, the honest near-dup shape — aHash is
        # unstable on flat textures where every cell sits at the mean
        img = bytearray()
        for y in range(h):
            for x in range(w):
                v = (x * 255 // max(w - 1, 1) + y * 191 // max(h - 1, 1)) % 256
                img += bytes([v, (v * 3) % 256, 255 - v])
        seed = bytes(img)
        w4, h4, c4, px4 = parse_jpeg(make_jpeg(w, h, seed))
        w2, h2, c2, px2 = parse_jpeg(make_jpeg(w, h, seed, subsampling="420"))
        d = bin(dhash64(px4, w4, h4, c4) ^ dhash64(px2, w2, h2, c2)).count("1")
        a = bin(ahash64(px4, w4, h4, c4) ^ ahash64(px2, w2, h2, c2)).count("1")
        assert d <= 4, f"dhash hamming {d} across subsampling"
        assert a <= 4, f"ahash hamming {a} across subsampling"


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
    # a SEQUENTIAL stream relabeled SOF2 routes to the progressive
    # walker, whose scan validation must reject it loudly (the sequential
    # SOS declares Ss=0..Se=63 — an illegal progressive band)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="band"):
        parse_jpeg(prog)
    # genuinely unsupported SOF (extended sequential, SOF1)
    ext = good.replace(b"\xff\xc0", b"\xff\xc1", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        parse_jpeg(ext)
    # truncated entropy stream (cut before EOI)
    with pytest.raises(ValueError, match="EOI|exhausted"):
        parse_jpeg(good[:-20])
    # sampling factors beyond baseline-common scope (h or v > 2)
    sub = bytearray(good)
    i = sub.find(b"\xff\xc0")
    sub[i + 2 + 2 + 6 + 1] = 0x33  # first component h=v=3
    with pytest.raises(ValueError, match="sampling factors"):
        parse_jpeg(bytes(sub))
    # in-scope factors that CONTRADICT the entropy stream (declare 4:2:0
    # over a 4:4:4 stream): the MCU walk must fail loudly, not emit
    # garbage pixels
    lie = bytearray(make_jpeg(23, 11, b"mismatch probe"))
    i = lie.find(b"\xff\xc0")
    lie[i + 2 + 2 + 6 + 1] = 0x22
    with pytest.raises(ValueError):
        parse_jpeg(bytes(lie))
    # a DRI announcing restart markers the entropy stream does not have:
    # the decoder must detect the lost sync, not free-run past it
    # (multi-MCU image — on a single-MCU image no marker is ever due and
    # a spurious DRI is harmless)
    multi = make_jpeg(24, 16, b"multi mcu")
    j = multi.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x02"
    with pytest.raises(ValueError, match="restart marker"):
        parse_jpeg(multi[:j] + dri + multi[j:])
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


def test_restart_interval_roundtrip_and_resync():
    """DRI/RSTn support (round 6): restart markers are byte-aligned,
    cycle 0-7, and reset DC prediction — the decode must be identical to
    the marker-free encoding of the same pixels, for 4:4:4, grayscale,
    and 4:2:0 layouts and for intervals spanning >8 markers (index
    wraparound)."""
    cases = [
        (24, 16, b"restart 444", {}),  # 6 MCUs, ri=2 -> 2 markers
        (40, 40, b"wrap around!", {}),  # 25 MCUs, ri=2 -> 12 markers (wraps)
        (17, 9, b"gray rst", {"gray": True}),
        (33, 21, b"rst 420", {"subsampling": "420"}),  # 3x2 MCUs
    ]
    for w, h, seed, kw in cases:
        plain = parse_jpeg(make_jpeg(w, h, seed, **kw))
        with_rst = make_jpeg(w, h, seed, restart_interval=2, **kw)
        assert b"\xff\xdd" in with_rst  # DRI present
        assert any(
            bytes([0xFF, 0xD0 + m]) in with_rst for m in range(8)
        )
        assert parse_jpeg(with_rst) == plain, (w, h, kw)


def test_restart_marker_out_of_sequence_rejected():
    """A wrong-index RSTn at a resync point is a lost stream."""
    payload = bytearray(make_jpeg(24, 16, b"seq check", restart_interval=1))
    # find the first restart marker (FFD0) after SOS and break its index
    sos = payload.find(b"\xff\xda")
    i = payload.find(b"\xff\xd0", sos)
    assert i > 0
    payload[i + 1] = 0xD5  # RST0 -> RST5
    with pytest.raises(ValueError, match="restart marker"):
        parse_jpeg(bytes(payload))


def test_restart_resets_dc_prediction():
    """If the decoder failed to reset predictors at a marker the DC of
    every block after the first interval would shift — caught by pixel
    comparison on an image whose left and right halves differ."""
    w, h = 32, 8  # 4 MCUs in a row, ri=1 -> marker between every MCU
    img = bytes([40] * (16 * 8 * 3)) + bytes([200] * (16 * 8 * 3))
    payload = make_jpeg(w, h, img, restart_interval=1)
    pw, ph, c, px = parse_jpeg(payload)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(np.int16)
    src = _src_rgb(w, h, img)
    assert int(np.abs(src - got).max()) <= 3


def test_progressive_decode_identical_to_sequential():
    """Progressive (SOF2) decode — the multi-scan accumulation of
    spectral-selection + successive-approximation coefficients — must
    land on BIT-IDENTICAL pixels to the sequential decode of the same
    source (both coders quantize identically, so any deviation is a
    decode bug): 4:4:4, 4:2:0, grayscale, single-block, multi-MCU, odd
    dims, and the all-flat image whose every AC band rides EOB runs."""
    from hainan_big_data_recommend_system_spark.operators.jpeg import (
        make_progressive_jpeg,
    )

    cases = [
        (8, 8, b"hello", {}),
        (23, 11, b"some document text", {}),
        (19, 21, b"progressive 420", {"subsampling": "420"}),
        (17, 9, b"noninterleaved luma grid", {"subsampling": "420"}),
        (10, 7, b"gray", {"gray": True}),
        (1, 1, b"x", {}),
        (64, 48, bytes(range(256)), {}),
        (40, 40, b"bigger picture with more blocks", {}),
    ]
    for w, h, seed, kw in cases:
        assert parse_jpeg(make_jpeg(w, h, seed, **kw)) == parse_jpeg(
            make_progressive_jpeg(w, h, seed, **kw)
        ), (w, h, kw)
    flat = bytes([77, 77, 77]) * 64 * 64
    assert parse_jpeg(make_jpeg(64, 64, flat)) == parse_jpeg(
        make_progressive_jpeg(64, 64, flat)
    )


def test_progressive_randomized_equivalence():
    """Seeded randomized sweep: arbitrary dims/content through all three
    layouts — broad coverage of EOB-run lengths, ZRL-in-refinement
    interleaving, and correction-bit buffering."""
    import random

    from hainan_big_data_recommend_system_spark.operators.jpeg import (
        make_progressive_jpeg,
    )

    rng = random.Random(20260814)
    for _ in range(25):
        w, h = rng.randrange(1, 50), rng.randrange(1, 50)
        seed = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
        kw = rng.choice([{}, {"subsampling": "420"}, {"gray": True}])
        assert parse_jpeg(make_jpeg(w, h, seed, **kw)) == parse_jpeg(
            make_progressive_jpeg(w, h, seed, **kw)
        ), (w, h, kw)


def test_progressive_rejects_malformed():
    from hainan_big_data_recommend_system_spark.operators.jpeg import (
        make_progressive_jpeg,
    )

    good = make_progressive_jpeg(16, 16, b"probe")
    # truncated mid-scan
    with pytest.raises(ValueError):
        parse_jpeg(good[:-30])
    # a DRI with nonzero interval inside a progressive stream
    j = good.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x02"
    with pytest.raises(ValueError, match="progressive"):
        parse_jpeg(good[:j] + dri + good[j:])


def test_fill_bytes_before_eoi_and_rst_accepted():
    """ADVICE r6: T.81 §B.1.1.2 allows optional 0xFF fill bytes before
    any marker; compliant streams from other encoders pad before EOI
    (and sometimes before RSTn) and must decode, not quarantine."""
    base = make_jpeg(23, 11, b"fill bytes")
    assert base.endswith(b"\xff\xd9")
    padded = base[:-2] + b"\xff" * 5 + b"\xff\xd9"
    assert parse_jpeg(padded) == parse_jpeg(base)

    # fill byte before a restart marker resyncs identically
    rst = make_jpeg(48, 16, b"rst fill", restart_interval=2)
    sos = rst.find(b"\xff\xda")
    k = rst.find(b"\xff\xd0", sos)
    assert k > 0, "fixture has no RST0 marker"
    padded_rst = rst[:k] + b"\xff" + rst[k:]
    assert parse_jpeg(padded_rst) == parse_jpeg(rst)


def test_trailing_real_entropy_bytes_still_rejected():
    """The fill-byte allowance must not weaken the geometry check:
    non-FF unread bytes after the final MCU are still an error."""
    base = make_jpeg(23, 11, b"geometry")
    bad = base[:-2] + b"\xab\xcd" + b"\xff\xd9"
    with pytest.raises(ValueError, match="trailing entropy"):
        parse_jpeg(bad)
