"""ID3v2.3 frame walk (operators/mp3.py round-7 addition): plain
32-bit v2.3 sizes (not syncsafe), both text encodings, non-text skip,
padding stop, truncation rejection.  The composed query is
hash-oracled (`id3_tag_scan`)."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.mp3 import (
    make_id3_frames,
    parse_id3_frames,
)


def test_roundtrip_both_encodings_and_skip_padding():
    tag = make_id3_frames(
        [("TIT2", "Title", 0), ("TPE1", "歌手", 1), ("TXXX", "x", 0)]
    )
    tag += b"PRIV" + (4).to_bytes(4, "big") + b"\x00\x00" + b"blob"
    tag += b"\x00" * 16  # padding terminates the walk
    got = parse_id3_frames(tag)
    assert got == {"TIT2": "Title", "TPE1": "歌手", "TXXX": "x"}


def test_big_endian_bom_utf16():
    body = b"\x01\xfe\xff" + "Åbc".encode("utf-16-be")
    tag = b"TPE1" + len(body).to_bytes(4, "big") + b"\x00\x00" + body
    assert parse_id3_frames(tag) == {"TPE1": "Åbc"}


def test_plain_v23_size_not_syncsafe():
    # a 200-byte body: plain size 0x000000C8; a syncsafe reader would
    # misread 0xC8 (bit 7 set in the low byte) — pin the plain form
    text = "x" * 199
    tag = make_id3_frames([("TALB", text, 0)])
    assert tag[4:8] == (200).to_bytes(4, "big")
    assert parse_id3_frames(tag)["TALB"] == text


def test_truncated_frame_and_missing_bom_rejected():
    tag = make_id3_frames([("TIT2", "hello", 0)])
    with pytest.raises(ValueError, match="truncated"):
        parse_id3_frames(tag[:-3])
    body = b"\x01" + "no bom".encode("utf-16-le")
    raw = b"TPE1" + len(body).to_bytes(4, "big") + b"\x00\x00" + body
    with pytest.raises(ValueError, match="without BOM"):
        parse_id3_frames(raw)
