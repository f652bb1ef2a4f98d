"""ISO-BMFF walk semantics (operators/mp4.py) — the catalog oracle
(`mp4_video_meta`) pins the composed per-doc fields; these tests pin
the box-level mechanics: size escapes, version widths, offset
resolution, and the corrupt-input contract."""

from __future__ import annotations

import struct

import pytest

from hainan_big_data_recommend_system_spark.operators.mp4 import (
    _box,
    _walk,
    make_fixture_mp4,
    parse_mp4,
    video_fixture_params,
)


def test_roundtrip_all_variants():
    for did in range(24):  # covers fps x n x version x audio lattice
        p = video_fixture_params(did)
        out = parse_mp4(make_fixture_mp4(did))
        assert out["mvhd_version"] == p["version"]
        assert out["movie_duration"] == p["movie_duration"]
        assert out["n_tracks"] == (2 if p["has_audio"] else 1)
        assert out["video_codec"] == p["video_codec"]
        assert (out["width"], out["height"]) == (p["width"], p["height"])
        assert out["n_frames"] == p["n_frames"]
        assert out["video_sample_bytes"] == sum(p["video_sizes"])
        assert out["mdat_bytes"] == out["video_sample_bytes"] + out[
            "audio_sample_bytes"
        ]
        assert out["first_byte_fold"] == sum(p["first_bytes"])


def test_walk_largesize_and_to_end():
    a = _box(b"abcd", b"xy", largesize=True)
    b = struct.pack(">I4s", 0, b"wxyz") + b"tail-bytes"  # size 0: to end
    boxes = list(_walk(a + b, 0, len(a + b)))
    assert [t for t, _, _ in boxes] == [b"abcd", b"wxyz"]
    (_, s0, e0), (_, s1, e1) = boxes
    assert (a + b)[s0:e0] == b"xy"
    assert (a + b)[s1:e1] == b"tail-bytes"


def test_walk_rejects_overrun_and_undersized():
    with pytest.raises(ValueError):
        list(_walk(struct.pack(">I4s", 100, b"abcd"), 0, 8))
    with pytest.raises(ValueError):
        list(_walk(struct.pack(">I4s", 4, b"abcd"), 0, 8))  # size < header
    with pytest.raises(ValueError):
        list(_walk(b"\x00\x00\x00", 0, 3))  # truncated header


def test_unknown_top_level_box_is_skipped():
    # a trailing 'free' box (editors leave them) must not change the
    # parse; splicing BEFORE moov would shift the absolute stco
    # offsets, which the parser correctly rejects
    data = make_fixture_mp4(5)
    assert parse_mp4(data + _box(b"free", b"junk" * 5)) == parse_mp4(data)
    with pytest.raises(ValueError):
        parse_mp4(data[:8] + _box(b"free", b"junk" * 5) + data[8:])


def test_mdat_mass_cross_check():
    data = bytearray(make_fixture_mp4(2))
    # grow mdat by appending a byte (fix up its 32-bit size field)
    idx = bytes(data).index(b"mdat") - 4
    size = int.from_bytes(data[idx:idx + 4], "big")
    data[idx:idx + 4] = struct.pack(">I", size + 1)
    data += b"\x00"
    with pytest.raises(ValueError, match="mdat payload"):
        parse_mp4(bytes(data))


def test_v1_layout_uses_largesize_and_co64():
    did = 3  # doc_id % 4 == 3 -> version-1 layout
    data = make_fixture_mp4(did)
    assert b"co64" in data and b"stco" not in data
    # the mdat box uses the 64-bit size escape
    idx = data.index(b"mdat") - 4
    assert int.from_bytes(data[idx:idx + 4], "big") == 1
    out = parse_mp4(data)
    assert out["mvhd_version"] == 1
    assert out["first_byte_fold"] == sum(
        video_fixture_params(did)["first_bytes"]
    )


def test_missing_required_box_raises():
    data = make_fixture_mp4(1)
    # blank out the stsz fourcc -> track loses its size table
    idx = data.index(b"stsz")
    broken = data[:idx] + b"xxxx" + data[idx + 4:]
    with pytest.raises(ValueError):
        parse_mp4(broken)
