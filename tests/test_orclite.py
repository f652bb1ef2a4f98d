"""ORC-lite walk (operators/orclite.py): RLEv1 run/literal boundaries,
zigzag signed columns, tail-first framing, stream-geometry validation.
The composed query is hash-oracled (`orc_container_scan`)."""

from __future__ import annotations

import random

import pytest

from hainan_big_data_recommend_system_spark.operators.orclite import (
    make_orc,
    parse_orc,
    rle_v1_decode,
    rle_v1_encode,
)


@pytest.mark.parametrize("signed", [True, False])
def test_rle_roundtrip_runs_literals_boundaries(signed):
    rng = random.Random(11)
    cases = [
        [0], [1, 2], [5] * 3, [5] * 130, list(range(130)),
        [3, 1, 4, 1, 5, 9, 2, 6] * 40,
        [rng.randrange(1 << 40) for _ in range(333)],
    ]
    if signed:
        cases.append([(-1) ** i * i * 7 for i in range(200)])
    for vals in cases:
        enc = rle_v1_encode(vals, signed)
        assert rle_v1_decode(enc, len(vals), signed) == vals


def test_container_roundtrip_multistripe_unicode_negative():
    stripes = [
        [(i * 3 - 50, f"név{i % 7}") for i in range(40)],
        [(-(2**40) + i, "x" * (i % 5)) for i in range(25)],
    ]
    m = parse_orc(make_orc(stripes))
    assert m["n_stripes"] == 2
    assert m["rows"] == [r for s in stripes for r in s]


def test_tail_framing_validation():
    raw = bytearray(make_orc([[(1, "a"), (2, "b"), (3, "c")]]))
    with pytest.raises(ValueError, match="magic"):
        parse_orc(b"XXX" + bytes(raw[3:]))
    bad = bytearray(raw)
    bad[-1] = 250  # postscript length past the file start
    with pytest.raises(ValueError, match="postscript length"):
        parse_orc(bytes(bad))


def test_row_count_and_stream_geometry_validation():
    raw = bytearray(make_orc([[(1, "a"), (2, "bb"), (3, "c")]]))
    # shrink the declared total row count in the footer: footer starts
    # after the stripe; patch via rebuilding is brittle, so corrupt the
    # string-length stream instead: flip a length byte so lengths no
    # longer sum to the data stream
    s = bytes(raw)
    # locate "abbc" payload and flip the RLE literal header before it
    i = s.index(b"abbc")
    bad = bytearray(s)
    bad[i - 4] ^= 0x01  # perturb the id/length RLE region
    with pytest.raises(ValueError):
        parse_orc(bytes(bad))


def test_compression_other_than_none_rejected():
    raw = bytearray(make_orc([[(1, "a"), (2, "b"), (3, "c")]]))
    # postscript is the last ps_len bytes before the final length byte;
    # field 2 (compression) varint 0 lives there — set it to 1 (ZLIB)
    ps_len = raw[-1]
    ps = bytearray(raw[-1 - ps_len : -1])
    # ps = field1 tag+varint, field2 tag 0x10, value 0x00
    assert ps[-2] == 0x10 and ps[-1] == 0x00
    ps[-1] = 0x01
    patched = bytes(raw[: -1 - ps_len]) + bytes(ps) + bytes([ps_len])
    with pytest.raises(ValueError, match="NONE compression"):
        parse_orc(patched)
