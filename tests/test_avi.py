"""AVI container codec: round-trip, nested-LIST walk, corrupt contract."""

from __future__ import annotations

import struct

import pytest

from hainan_big_data_recommend_system_spark.operators.avi import (
    avi_features,
    make_avi,
    make_fixture_avi,
    parse_avi,
)
from hainan_big_data_recommend_system_spark.operators.jpeg import make_jpeg


def test_round_trip():
    frames = [make_jpeg(16, 8, bytes([g] * 3), gray=True) for g in (10, 20, 30)]
    us, n, w, h, back = parse_avi(make_avi(frames, 16, 8, us_per_frame=33_333))
    assert (us, n, w, h) == (33_333, 3, 16, 8)
    assert back == frames  # byte-identical payload extraction


def test_features_decode_every_frame():
    n, us, w, h, gs = avi_features(make_fixture_avi(7))
    assert n == 2 + 7 % 3
    assert gs == sum((7 * 31 + i * 17) % 256 for i in range(n))


def test_odd_length_frame_chunks_align():
    # payloads of GUARANTEED odd length force the word-alignment padding
    # path (a trailing byte after EOI is legal and ignored by decoders)
    frames = [make_jpeg(8, 8, bytes([g] * 3), gray=True) for g in (1, 2, 3, 4)]
    odd = [f if len(f) % 2 == 1 else f + b"\x00" for f in frames]
    assert all(len(f) % 2 == 1 for f in odd)
    got = parse_avi(make_avi(odd, 8, 8))[4]
    assert got == odd


def test_frame_count_mismatch_raises():
    frames = [make_jpeg(8, 8, b"\x05\x05\x05", gray=True)]
    avi = bytearray(make_avi(frames, 8, 8))
    # patch avih total_frames (offset: RIFF(12) + LIST hdr(12) + 'avih'(8)
    # + 4 fields of 4 bytes) to a lie
    off = 12 + 12 + 8 + 16
    avi[off : off + 4] = struct.pack("<I", 9)
    with pytest.raises(ValueError, match="declares 9 frames"):
        parse_avi(bytes(avi))


@pytest.mark.parametrize(
    "mutate",
    [
        lambda a: b"RIFX" + a[4:],   # bad magic
        lambda a: a[:40],            # truncated
        lambda a: a[:4] + struct.pack("<I", len(a) + 50) + a[8:],  # riff lies
    ],
)
def test_corrupt_payloads_raise_valueerror(mutate):
    avi = make_fixture_avi(3)
    with pytest.raises(ValueError):
        parse_avi(mutate(avi))


def test_dim_contradiction_raises():
    frames = [make_jpeg(8, 8, b"\x05\x05\x05", gray=True)]
    avi = make_avi(frames, 16, 16)  # container lies about frame dims
    with pytest.raises(ValueError, match="contradict"):
        avi_features(avi)


def test_deeply_nested_lists_no_recursion_error():
    # ~5000 nested LIST headers: the iterative walk must terminate (and
    # then fail with the CONTRACT error for the missing avih), never a
    # RecursionError escaping a corpus decode task
    inner = b""
    for _ in range(5000):
        inner = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"nest" + inner
    payload = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
    with pytest.raises(ValueError, match="avih"):
        parse_avi(payload)
