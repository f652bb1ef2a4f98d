"""ADTS walk semantics (operators/adts.py): raw-data-block duration
accounting, CRC geometry, and rejection paths.  The composed corpus
query is hash-oracled in tests/test_oracle.py (`aac_audio_meta`)."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.adts import (
    SAMPLE_RATES,
    make_adts,
    parse_adts,
)


def test_roundtrip_fields_and_block_duration():
    # rdb values 0..3 -> 1+4+2+3 = 10 blocks, NOT 4 frames x 1024
    m = parse_adts(
        make_adts(
            [(0, 21), (3, 33), (1, 40), (2, 10)],
            profile=2, sfi=3, channels=6,
        )
    )
    assert m["n_frames"] == 4
    assert m["total_blocks"] == 10
    assert m["sample_rate"] == 48000
    assert m["channels"] == 6
    assert m["profile"] == "SSR"
    assert m["duration_ms"] == 10 * 1024 * 1000 // 48000
    assert m["stream_bytes"] == 4 * 7 + 21 + 33 + 40 + 10
    assert not m["is_vbr"] and not m["has_crc"]


def test_crc_adds_two_bytes_per_frame():
    plain = parse_adts(make_adts([(0, 5), (0, 5)], 1, 4, 2, crc=False))
    crc = parse_adts(make_adts([(0, 5), (0, 5)], 1, 4, 2, crc=True))
    assert crc["stream_bytes"] - plain["stream_bytes"] == 4
    assert crc["has_crc"] and not plain["has_crc"]
    assert crc["duration_ms"] == plain["duration_ms"]


def test_vbr_fullness_detected():
    assert parse_adts(make_adts([(0, 5)], 1, 4, 2, vbr=True))["is_vbr"]


def test_midstream_parameter_change_rejected():
    a = make_adts([(0, 5)], profile=1, sfi=4, channels=2)
    b = make_adts([(0, 5)], profile=1, sfi=5, channels=2)
    with pytest.raises(ValueError, match="mid-stream"):
        parse_adts(a + b)


def test_truncation_and_lost_sync_rejected():
    good = make_adts([(0, 20), (1, 20)], 1, 4, 2)
    with pytest.raises(ValueError, match="truncated|trailing"):
        parse_adts(good[:-3])
    with pytest.raises(ValueError, match="sync"):
        parse_adts(b"\x00" + good)


def test_reserved_frequency_index_rejected():
    with pytest.raises(ValueError, match="reserved"):
        make_adts([(0, 5)], 1, 12, 2)
    # parser-side too: patch a reserved sfi into valid bytes
    raw = bytearray(make_adts([(0, 5)], 1, 4, 2))
    raw[2] = (raw[2] & 0xC3) | (13 << 2)
    with pytest.raises(ValueError, match="reserved"):
        parse_adts(bytes(raw))


def test_declared_length_below_header_rejected():
    raw = bytearray(make_adts([(0, 5)], 1, 4, 2, crc=True))
    # rewrite the 13-bit length field to 8 (< the 9-byte CRC header)
    flen = 8
    raw[3] = (raw[3] & 0xFC) | ((flen >> 11) & 3)
    raw[4] = (flen >> 3) & 0xFF
    raw[5] = (raw[5] & 0x1F) | ((flen & 7) << 5)
    with pytest.raises(ValueError, match="below its"):
        parse_adts(bytes(raw))


def test_rates_table_is_the_public_one():
    assert SAMPLE_RATES[4] == 44100 and len(SAMPLE_RATES) == 12
