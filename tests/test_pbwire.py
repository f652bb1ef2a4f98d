"""Protobuf wire-format semantics (operators/pbwire.py): varint
continuation, zigzag sign round-trips, unknown-field skip by wire
type, and truncation rejection.  The composed corpus query is
hash-oracled in tests/test_oracle.py (`pb_log_scan`)."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.pbwire import (
    make_pb_log,
    parse_pb_stream,
    read_varint,
    write_varint,
    zigzag_decode,
    zigzag_encode,
)


def test_varint_roundtrip_and_boundaries():
    for v in (0, 1, 127, 128, 300, 2**21 - 1, 2**21, 2**63 - 1):
        buf = write_varint(v)
        got, pos = read_varint(buf, 0)
        assert (got, pos) == (v, len(buf))
    assert write_varint(127) == b"\x7f"
    assert write_varint(128) == b"\x80\x01"  # little-endian groups
    assert write_varint(300) == b"\xac\x02"


def test_zigzag_both_signs():
    # the spec examples: 0->0, -1->1, 1->2, -2->3
    assert [zigzag_encode(v) for v in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]
    for v in (0, -1, 1, -64, 63, -(2**31), 2**31, -(2**62)):
        assert zigzag_decode(zigzag_encode(v)) == v


def _rec(j=0, **kw):
    r = {"ts": 1000 + j, "user": f"u{j}", "delta": j - 1,
         "payload": b"xy" * j, "checksum": 7 + j}
    r.update(kw)
    return r


def test_stream_aggregates():
    m = parse_pb_stream(make_pb_log([
        _rec(0, nested=5), _rec(1), _rec(2, user="u0"),
    ]))
    assert m["n_records"] == 3
    assert m["sum_ts"] == 3003
    assert m["sum_delta"] == 0  # -1 + 0 + 1: zigzag both signs
    assert m["distinct_users"] == 2  # u0, u1, u0
    assert m["payload_bytes"] == 0 + 2 + 4
    assert m["checksum_sum"] == 7 + 8 + 9
    assert (m["n_nested"], m["nested_sum"]) == (1, 5)


def test_unknown_fields_skipped_by_wire_type():
    base = make_pb_log([_rec(0)])
    # rebuild the single message with extra unknown fields appended:
    # field 9 varint, field 10 length-delimited, field 11 fixed64
    ln, pos = read_varint(base, 0)
    msg = bytearray(base[pos:pos + ln])
    msg += write_varint((9 << 3) | 0) + write_varint(99)
    msg += write_varint((10 << 3) | 2) + write_varint(3) + b"abc"
    msg += write_varint((11 << 3) | 1) + (123456789).to_bytes(8, "little")
    stream = write_varint(len(msg)) + bytes(msg)
    m = parse_pb_stream(stream)
    assert m["n_records"] == 1 and m["sum_ts"] == 1000


def test_truncation_and_reserved_wire_type_rejected():
    good = make_pb_log([_rec(0), _rec(1)])
    with pytest.raises(ValueError, match="truncated"):
        parse_pb_stream(good[:-2])
    # wire type 7 is reserved
    msg = write_varint((1 << 3) | 7)
    with pytest.raises(ValueError, match="reserved wire type"):
        parse_pb_stream(write_varint(len(msg)) + msg)


def test_missing_required_field_rejected():
    msg = write_varint((1 << 3) | 0) + write_varint(5)  # ts only
    with pytest.raises(ValueError, match="missing required"):
        parse_pb_stream(write_varint(len(msg)) + msg)


def test_overlong_varint_rejected():
    with pytest.raises(ValueError, match="64 bits"):
        read_varint(b"\xff" * 10 + b"\x01", 0)
