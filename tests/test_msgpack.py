"""MessagePack walk (operators/msgpackfmt.py): the negative-fixint
sign trap, width boundaries both signs, nesting depth guard, float
quarantine, reserved byte, truncation.  The composed query is
hash-oracled (`msgpack_log_scan`)."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.msgpackfmt import (
    pack,
    parse_msgpack_stream,
    unpack_one,
)


def test_negative_fixint_sign_trap():
    assert unpack_one(b"\xe0", 0) == (-32, 1)
    assert unpack_one(b"\xff", 0) == (-1, 1)
    assert pack(-32) == b"\xe0" and pack(-1) == b"\xff"


@pytest.mark.parametrize(
    "v",
    [0, 127, 128, 255, 256, 65535, 65536, 2**32 - 1, 2**32, 2**63 - 1,
     -1, -32, -33, -128, -129, -32768, -32769, -(2**31), -(2**31) - 1,
     -(2**63)],
)
def test_int_width_boundaries_roundtrip(v):
    buf = pack(v)
    assert unpack_one(buf, 0) == (v, len(buf))


def test_nested_structures_and_str_widths():
    obj = {"a": [1, {"b": "x" * 40}], "c": b"\x00\x01", "d": None}
    buf = pack(obj)
    assert unpack_one(buf, 0) == (obj, len(buf))


def test_depth_guard_truncation_float_and_reserved():
    deep = b"\x91" * 40 + b"\x01"  # 40 nested single-element arrays
    with pytest.raises(ValueError, match="depth"):
        unpack_one(deep, 0)
    with pytest.raises(ValueError, match="truncated"):
        unpack_one(b"\xcd\x01", 0)  # uint16 missing a byte
    with pytest.raises(ValueError, match="float"):
        unpack_one(b"\xca\x00\x00\x00\x00", 0)
    with pytest.raises(ValueError, match="reserved"):
        unpack_one(b"\xc1", 0)


def test_stream_requires_map_objects():
    with pytest.raises(ValueError, match="must be maps"):
        parse_msgpack_stream(pack([1, 2]))
    m = parse_msgpack_stream(pack({"k": 5}) + pack({"k": -5}))
    assert m["n_records"] == 2 and m["sum_ints"] == 0
    assert m["n_strings"] == 2  # the two keys
