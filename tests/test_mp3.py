"""MP3 frame-header walk (operators/mp3.py): framing, ID3v2 syncsafe
skip, reserved-index rejection.  mp3_audio_meta is oracle-gated in
test_oracle."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.mp3 import (
    BITRATES,
    SAMPLE_RATES,
    frame_length,
    make_mp3,
    parse_mp3,
)


def test_walk_and_tables():
    frames = [(9, 0, 0, 1), (11, 0, 1, 1), (5, 0, 0, 3)]
    m = parse_mp3(make_mp3(frames, id3_payload=b"TIT2 title here"))
    assert m["n_frames"] == 3
    assert m["sample_rate"] == 44100
    assert m["bitrate_sum_kbps"] == 128 + 192 + 64
    assert m["duration_ms"] == (3 * 1152 * 1000) // 44100
    assert m["id3_bytes"] == 10 + 15
    assert m["channel_modes"] == [1, 3]


def test_padding_changes_frame_length_by_one():
    assert frame_length(128, 44100, 1) == frame_length(128, 44100, 0) + 1


def test_id3_size_is_syncsafe():
    # 200-byte payload: syncsafe encoding crosses the 7-bit boundary
    payload = bytes(200)
    p = make_mp3([(9, 0, 0, 1)], id3_payload=payload)
    assert parse_mp3(p)["id3_bytes"] == 210
    # a non-syncsafe size byte (high bit set) must be rejected
    bad = bytearray(p)
    bad[6] |= 0x80
    with pytest.raises(ValueError, match="syncsafe"):
        parse_mp3(bytes(bad))


def test_rejects_malformed():
    good = make_mp3([(9, 0, 0, 1), (9, 0, 0, 1)])
    with pytest.raises(ValueError, match="sync"):
        parse_mp3(b"\x00\x00" + good)
    with pytest.raises(ValueError, match="truncated"):
        parse_mp3(good[:-10])
    # reserved bitrate index in the SECOND frame header (the bitrate
    # index lives in header byte 2, bits 7..4)
    flen = frame_length(BITRATES[9], SAMPLE_RATES[0], 0)
    bad = bytearray(good)
    bad[flen + 2] = (bad[flen + 2] & 0x0F) | 0xF0
    with pytest.raises(ValueError, match="reserved bitrate"):
        parse_mp3(bytes(bad))
    # an ID3 tag with nothing after it is not an MP3
    with pytest.raises(ValueError, match="no MP3 frames"):
        parse_mp3(make_mp3([(9, 0, 0, 1)], id3_payload=b"x")[:11])
