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


def test_xing_vbr_tag_parsed_and_excluded_from_audio():
    """Round 7 (VERDICT r6 #8): a Xing tag frame is metadata — declared
    frame/byte counts surface, duration comes from the declared count,
    and the tag frame never pollutes audio accounting."""
    from hainan_big_data_recommend_system_spark.operators.mp3 import (
        frame_length,
        make_mp3,
        parse_mp3,
        BITRATES,
        SAMPLE_RATES,
    )

    frames = [(3, 1, 0, 0), (9, 1, 1, 0), (14, 1, 0, 0)]  # true VBR
    payload = make_mp3(frames, vbr_tag="Xing")
    m = parse_mp3(payload)
    assert m["vbr_tag"] == "Xing"
    assert m["n_frames"] == 4          # tag frame + 3 audio frames
    assert m["audio_frames"] == 3
    assert m["xing_frames"] == 3
    tag_len = frame_length(BITRATES[3], SAMPLE_RATES[1], 0)
    audio_len = sum(
        frame_length(BITRATES[bi], SAMPLE_RATES[si], pad)
        for bi, si, pad, _ in frames
    )
    assert m["xing_bytes"] == tag_len + audio_len == len(payload)
    assert m["duration_ms"] == (3 * 1152 * 1000) // 48000

    # Info tag (LAME CBR) parses identically; mono geometry (17-byte
    # side info) also resolves
    mono = make_mp3([(5, 0, 0, 3), (5, 0, 0, 3)], vbr_tag="Info")
    mi = parse_mp3(mono)
    assert mi["vbr_tag"] == "Info" and mi["xing_frames"] == 2
    assert mi["audio_frames"] == 2


def test_vbr_tag_with_id3_and_cbr_unchanged():
    from hainan_big_data_recommend_system_spark.operators.mp3 import (
        make_mp3,
        parse_mp3,
    )

    tagged = make_mp3(
        [(4, 2, 0, 1)], id3_payload=b"title etc", vbr_tag="Xing"
    )
    m = parse_mp3(tagged)
    assert m["id3_bytes"] == 10 + 9 and m["vbr_tag"] == "Xing"
    # CBR stream without a tag: legacy fields identical, vbr fields null
    plain = parse_mp3(make_mp3([(4, 2, 0, 1), (4, 2, 1, 1)]))
    assert plain["vbr_tag"] is None and plain["xing_frames"] is None
    assert plain["n_frames"] == plain["audio_frames"] == 2
    assert plain["duration_ms"] == (2 * 1152 * 1000) // 32000


def test_vbr_tag_validation():
    import pytest as _pytest

    from hainan_big_data_recommend_system_spark.operators.mp3 import (
        make_mp3,
        parse_mp3,
    )

    with _pytest.raises(ValueError, match="vbr_tag"):
        make_mp3([(4, 1, 0, 0)], vbr_tag="VBRI")
    with _pytest.raises(ValueError, match="at least one frame"):
        make_mp3([], vbr_tag="Xing")
    only_tag = make_mp3([(4, 1, 0, 0)], vbr_tag="Xing")
    # strip the audio frame: a stream holding ONLY the tag frame is junk
    from hainan_big_data_recommend_system_spark.operators.mp3 import (
        frame_length,
        BITRATES,
        SAMPLE_RATES,
    )
    tag_only = only_tag[: frame_length(BITRATES[4], SAMPLE_RATES[1], 0)]
    with _pytest.raises(ValueError, match="only the Xing/Info"):
        parse_mp3(tag_only)
