"""BSON walk (operators/bson.py): total-length framing (includes the
4 length bytes AND the terminator — the off-by-four), little-endian
widths, array key validation, float quarantine, truncation.  The
composed query is hash-oracled (`bson_log_scan`)."""

from __future__ import annotations

import struct

import pytest

from hainan_big_data_recommend_system_spark.operators.bson import (
    pack_document,
    parse_bson_stream,
    unpack_document,
)


def test_total_length_includes_header_and_terminator():
    buf = pack_document({"x": 1})
    assert struct.unpack_from("<i", buf, 0)[0] == len(buf)
    assert buf[-1] == 0


def test_roundtrip_widths_and_nesting():
    doc = {
        "i32": -(2**31),
        "i64": 2**31,
        "s": "héllo",
        "n": None,
        "t": True,
        "bin": b"\x00\x01",
        "arr": [1, "two", {"y": 3}],
        "sub": {"z": []},
    }
    got, p = unpack_document(pack_document(doc), 0)
    assert got == doc


def test_bad_framing_rejected():
    buf = bytearray(pack_document({"x": 1}))
    struct.pack_into("<i", buf, 0, len(buf) + 7)
    with pytest.raises(ValueError, match="declares"):
        unpack_document(bytes(buf), 0)
    buf2 = bytearray(pack_document({"x": 1}))
    buf2[-1] = 7
    with pytest.raises(ValueError, match="terminator"):
        unpack_document(bytes(buf2), 0)


def test_array_keys_must_be_dense_indexes():
    # hand-build an array doc with key "1" instead of "0"
    inner = pack_document({"1": 5})
    body = b"\x04" + b"a\x00" + inner
    buf = struct.pack("<i", len(body) + 5) + body + b"\x00"
    with pytest.raises(ValueError, match="0..n-1"):
        unpack_document(buf, 0)


def test_double_and_unknown_type_quarantine():
    body = b"\x01" + b"d\x00" + struct.pack("<d", 1.5)
    buf = struct.pack("<i", len(body) + 5) + body + b"\x00"
    with pytest.raises(ValueError, match="double"):
        unpack_document(buf, 0)
    body = b"\x7f" + b"q\x00"
    buf = struct.pack("<i", len(body) + 5) + body + b"\x00"
    with pytest.raises(ValueError, match="unsupported BSON type"):
        unpack_document(buf, 0)


def test_stream_aggregates():
    m = parse_bson_stream(
        pack_document({"id": 5, "tag": "a"})
        + pack_document({"id": -5, "ok": None})
    )
    assert m["n_docs"] == 2 and m["sum_ints"] == 0
    assert m["n_strings"] == 1 and m["n_nulls"] == 1
