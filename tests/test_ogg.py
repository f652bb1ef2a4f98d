"""Ogg/Opus page-walk semantics (operators/ogg.py) — the catalog
oracle (`ogg_opus_meta`) pins composed per-doc fields; these pin the
framing mechanics: CRC enforcement, lacing reassembly, page ordering."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.ogg import (
    make_ogg_opus,
    ogg_crc,
    parse_ogg_opus,
)


def test_roundtrip_and_duration_math():
    out = parse_ogg_opus(
        make_ogg_opus(2, 312, 44100, [50, 60, 70],
                      comments=[("title", "Pod")])
    )
    assert (out["channels"], out["pre_skip"], out["input_rate"]) == (
        2, 312, 44100,
    )
    assert out["n_packets"] == 3
    assert out["last_granule"] == 3 * 960
    assert out["duration_ms"] == (3 * 960 - 312) * 1000 // 48000
    assert out["tags"] == [("TITLE", "Pod")]


def test_cross_page_packet_reassembly():
    # first packet split 255+45 across two pages; packet count must not
    # change and the intermediate page carries granule -1
    plain = parse_ogg_opus(make_ogg_opus(1, 0, 48000, [120, 40]))
    spanned = parse_ogg_opus(
        make_ogg_opus(1, 0, 48000, [120, 40], span_pages=True)
    )
    assert spanned["n_packets"] == plain["n_packets"] == 2
    assert spanned["n_pages"] == plain["n_pages"] + 1
    assert spanned["last_granule"] == plain["last_granule"]


def test_crc_is_load_bearing():
    data = bytearray(make_ogg_opus(1, 0, 48000, [50]))
    data[-1] ^= 0x01  # flip one payload bit in the last page
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg_opus(bytes(data))


def test_crc_is_the_spec_variant_not_zlib():
    import zlib

    v = b"OggS framing vector"
    assert ogg_crc(v) != zlib.crc32(v)  # unreflected poly, init 0
    assert ogg_crc(b"") == 0


def test_sequence_gap_rejected():
    a = make_ogg_opus(1, 0, 48000, [50, 60])
    # drop the middle audio page: find the 3rd page boundary
    offs = []
    i = 0
    while True:
        i = a.find(b"OggS", i)
        if i < 0:
            break
        offs.append(i)
        i += 4
    assert len(offs) == 4  # head, tags, 2 audio pages
    broken = a[: offs[2]] + a[offs[3]:]
    with pytest.raises(ValueError, match="sequence gap"):
        parse_ogg_opus(broken)


def test_first_page_must_be_bos():
    a = make_ogg_opus(1, 0, 48000, [50])
    i = a.find(b"OggS", 4)  # start at the tags page
    with pytest.raises(ValueError, match="BOS"):
        parse_ogg_opus(a[i:])
