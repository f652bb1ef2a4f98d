"""Block/chunk-level semantics for the FLAC and WebP walks
(operators/flac.py, operators/webp.py) — the catalog oracles pin the
composed fields; these pin the format mechanics."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.flac import (
    make_flac,
    parse_flac,
)
from hainan_big_data_recommend_system_spark.operators.webp import (
    make_webp,
    parse_webp,
)


class TestFlac:
    def test_streaminfo_bit_extremes(self):
        out = parse_flac(make_flac((1 << 20) - 1, 8, 32, (1 << 36) - 1))
        assert out["sample_rate"] == (1 << 20) - 1
        assert out["channels"] == 8
        assert out["bits_per_sample"] == 32
        assert out["total_samples"] == (1 << 36) - 1

    def test_vorbis_comment_little_endian_and_key_case(self):
        out = parse_flac(
            make_flac(44100, 2, 16, 1000,
                      comments=[("title", "a=b"), ("Artist", "x")])
        )
        # keys upper-cased, values split on FIRST '=' only
        assert out["tags"] == [("TITLE", "a=b"), ("ARTIST", "x")]
        assert out["vendor"] == "hainan-spark-fixture"

    def test_duration_is_exact_integer(self):
        out = parse_flac(make_flac(44100, 1, 16, 44099))
        assert out["duration_ms"] == 44099 * 1000 // 44100 == 999

    def test_streaminfo_must_be_first_and_34_bytes(self):
        data = bytearray(make_flac(44100, 2, 16, 1000))
        data[4] = 0x81  # retype first block to PADDING|last
        with pytest.raises(ValueError, match="STREAMINFO"):
            parse_flac(bytes(data))
        data = bytearray(make_flac(44100, 2, 16, 1000))
        data[7] = 33  # shrink declared STREAMINFO length
        with pytest.raises(ValueError, match="34 bytes"):
            parse_flac(bytes(data))

    def test_overrun_block_rejected(self):
        data = bytearray(make_flac(44100, 2, 16, 1000))
        data[5:8] = (10_000).to_bytes(3, "big")
        with pytest.raises(ValueError, match="overruns"):
            parse_flac(bytes(data))


class TestWebp:
    def test_vp8_dims_mask_high_scale_bits(self):
        # top 2 bits of each u16 are a scaling hint, not geometry
        data = bytearray(make_webp("vp8", 320, 240))
        off = data.index(b"\x9d\x01\x2a") + 3
        data[off + 1] |= 0xC0  # set scale bits on width
        out = parse_webp(bytes(data))
        assert (out["width"], out["height"]) == (320, 240)

    def test_vp8l_bitstream_dims(self):
        out = parse_webp(make_webp("vp8l", 1, 16384, alpha=True))
        assert (out["width"], out["height"]) == (1, 16384)
        assert out["has_alpha"]

    def test_vp8x_canvas_authoritative(self):
        out = parse_webp(make_webp("vp8x", 70000, 50000))
        assert (out["variant"], out["width"], out["height"]) == (
            "vp8x", 70000, 50000,
        )
        assert not out["has_alpha"] and out["n_chunks"] == 2

    def test_odd_chunk_pad_byte_keeps_walk_aligned(self):
        # VP8L payload is 21 bytes (odd): without honoring the pad the
        # walk desyncs and the parse fails
        out = parse_webp(make_webp("vp8l", 33, 17))
        assert out["riff_size"] == 4 + 8 + 21 + 1

    def test_non_keyframe_rejected(self):
        data = bytearray(make_webp("vp8", 64, 48))
        off = data.index(b"VP8 ") + 8
        data[off] |= 1  # frame-type bit: interframe
        with pytest.raises(ValueError, match="keyframe"):
            parse_webp(bytes(data))

    def test_riff_size_overrun_rejected(self):
        data = bytearray(make_webp("vp8", 64, 48))
        data[4:8] = (len(data) + 50).to_bytes(4, "little")
        with pytest.raises(ValueError, match="overruns"):
            parse_webp(bytes(data))
