"""GIF codec (operators/gif.py): lossless LZW roundtrips, interlace
reordering, dictionary-reset sizes, magic dispatch, and rejection of
malformed streams.  The gif_meta catalog query is oracle-gated in
test_oracle."""

from __future__ import annotations

import random

import pytest

from hainan_big_data_recommend_system_spark.operators.gif import (
    _palette,
    make_gif,
    parse_gif,
)


def _expect(w: int, h: int, seed: bytes) -> bytes:
    pal = _palette()
    s = seed or b"\x00"
    idx = (s * (-(-(w * h) // len(s))))[: w * h]
    return b"".join(pal[3 * i : 3 * i + 3] for i in idx)


def test_roundtrip_exact_including_interlace_and_reset():
    rng = random.Random(3)
    cases = [
        (1, 1, b"x", False),
        (16, 9, b"hello gif world", False),
        (23, 11, b"doc text", True),
        (8, 8, b"", True),  # NUL-fallback seed
        (40, 30, bytes(range(256)), False),
        (40, 30, bytes(range(256)), True),
        # enough random content to push the LZW dictionary past 4096
        (120, 120, bytes(rng.randrange(256) for _ in range(5000)), True),
    ]
    for w, h, seed, il in cases:
        pw, ph, c, px = parse_gif(make_gif(w, h, seed, interlaced=il))
        assert (pw, ph, c) == (w, h, 3)
        assert px == _expect(w, h, seed), (w, h, il)


def test_interlace_changes_stored_order_not_pixels():
    seq = make_gif(16, 16, b"order probe", interlaced=False)
    lace = make_gif(16, 16, b"order probe", interlaced=True)
    assert seq != lace  # stored row order differs...
    assert parse_gif(seq) == parse_gif(lace)  # ...decoded image does not


def test_extensions_are_skipped():
    # splice a graphic-control extension before the image descriptor
    g = bytearray(make_gif(10, 5, b"ext"))
    i = 13 + 768  # header + logical screen + 256-entry color table
    assert g[i] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out = bytes(g[:i]) + gce + bytes(g[i:])
    assert parse_gif(out) == parse_gif(bytes(g))


def test_rejects_malformed():
    good = make_gif(10, 8, b"bad cases")
    with pytest.raises(ValueError, match="signature"):
        parse_gif(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError):
        parse_gif(good[:-4])  # truncated sub-blocks / missing trailer
    # LZW stream inconsistent with the declared frame size
    small = make_gif(4, 4, b"tiny")
    grown = bytearray(small)
    j = 13 + 768  # image descriptor offset (see above)
    assert grown[j] == 0x2C
    grown[j + 5 : j + 7] = (8).to_bytes(2, "little")  # widen frame 4->8
    with pytest.raises(ValueError, match="LZW|pixels"):
        parse_gif(bytes(grown))


def test_magic_dispatch_reaches_gif(spark):
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        decode_image_features,
    )

    payload = make_gif(12, 7, b"dispatch")
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "s")],
        "media_id long, media_type string, payload binary, source string",
    )
    row = decode_image_features(media).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (12, 7, 3)
