"""Avro OCF semantics (operators/avrocf.py): zigzag longs, union
branches, sync-marker discipline, deflate framing, and the
count/size-consistency check.  The composed corpus query is
hash-oracled in tests/test_oracle.py (`avro_container_scan`)."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.avrocf import (
    make_avro,
    parse_avro,
    read_long,
    write_long,
)

_SCHEMA = {
    "type": "record",
    "name": "LogRow",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "user", "type": "string"},
        {"name": "score", "type": ["null", "long"]},
        {"name": "flag", "type": "boolean"},
    ],
}


def _rec(i, score=None):
    return {"id": i, "user": f"u{i}", "score": score, "flag": i % 2 == 0}


def test_zigzag_long_roundtrip_spec_examples():
    # avro spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
    assert [write_long(v) for v in (0, -1, 1, -2, 2)] == [
        b"\x00", b"\x01", b"\x02", b"\x03", b"\x04",
    ]
    for v in (-(2**62), -12345, -1, 0, 1, 127, 128, 2**62):
        assert read_long(write_long(v), 0) == (v, len(write_long(v)))


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    blocks = [
        [_rec(1, score=10), _rec(-2)],
        [_rec(3, score=-5)],
    ]
    m = parse_avro(make_avro(_SCHEMA, blocks, codec=codec))
    assert m["codec"] == codec
    assert m["n_blocks"] == 2 and m["n_records"] == 3
    assert [r["id"] for r in m["records"]] == [1, -2, 3]
    assert [r["score"] for r in m["records"]] == [10, None, -5]
    assert [r["flag"] for r in m["records"]] == [False, True, False]


def test_deflate_is_raw_rfc1951_not_zlib():
    import zlib

    from hainan_big_data_recommend_system_spark.operators.avrocf import (
        _encode_field,
        _normalize_schema,
    )

    m = parse_avro(make_avro(_SCHEMA, [[_rec(7)]], codec="deflate"))
    assert m["n_records"] == 1 and m["codec"] == "deflate"
    # hand-build the SAME container but with a zlib-WRAPPED block
    # (wbits=15): a writer that forgets the raw-deflate rule must be
    # rejected, not silently half-read
    rec_bytes = b"".join(
        _encode_field(ft, _rec(7).get(name))
        for name, ft in _normalize_schema(_SCHEMA)
    )
    good = bytearray(make_avro(_SCHEMA, [[_rec(7)]], codec="deflate"))
    sync = bytes(range(16))
    i = good.index(sync) + 16  # start of the data block
    wrapped = zlib.compress(rec_bytes)  # zlib header + adler32
    bad = (
        bytes(good[:i])
        + write_long(1)
        + write_long(len(wrapped))
        + wrapped
        + sync
    )
    with pytest.raises(ValueError, match="deflate block corrupt"):
        parse_avro(bad)


def test_sync_marker_mismatch_rejected():
    raw = bytearray(make_avro(_SCHEMA, [[_rec(1)], [_rec(2)]]))
    raw[-1] ^= 0xFF  # corrupt the final block's sync marker
    with pytest.raises(ValueError, match="sync marker"):
        parse_avro(bytes(raw))


def test_count_size_inconsistency_rejected():
    raw = bytearray(make_avro(_SCHEMA, [[_rec(1), _rec(2)]]))
    # find the block count byte: it follows the header sync; count 2
    # zigzags to 0x04.  Drop it to 1 -> decoder consumes fewer bytes
    # than the declared size and must complain.
    sync = bytes(range(16))
    i = raw.index(sync) + 16
    assert raw[i] == 0x04
    raw[i] = 0x02  # declare 1 record
    with pytest.raises(ValueError, match="count/size"):
        parse_avro(bytes(raw))


def test_bad_magic_missing_schema_bad_union():
    with pytest.raises(ValueError, match="magic"):
        parse_avro(b"NOPE" + bytes(20))
    with pytest.raises(ValueError, match="unsupported field type"):
        # bare "record" is not a type — a union branch must be a full
        # record schema object (nested records ARE supported)
        make_avro(
            {"type": "record", "name": "r",
             "fields": [{"name": "x", "type": ["null", "record"]}]},
            [[]],
        )
    with pytest.raises(ValueError, match="unsupported union"):
        make_avro(
            {"type": "record", "name": "r",
             "fields": [{"name": "x", "type": ["null", "long", "int"]}]},
            [[]],
        )
    with pytest.raises(ValueError, match="unsupported field type"):
        make_avro(
            {"type": "record", "name": "r",
             "fields": [{"name": "x", "type": "double"}]},
            [[]],
        )


def test_boolean_byte_strictness():
    raw = bytearray(make_avro(_SCHEMA, [[_rec(0)]]))
    # the last record byte before the final sync is the boolean
    assert raw[-17] in (0, 1)
    raw[-17] = 2
    with pytest.raises(ValueError, match="boolean byte"):
        parse_avro(bytes(raw))


def test_snappy_and_zstd_codecs_roundtrip_and_crc():
    """Avro spec codecs beyond deflate: snappy blocks carry a 4-byte
    big-endian CRC32 of the UNCOMPRESSED bytes; zstd frames decode
    through the repo's own decoder."""
    import pytest

    from hainan_big_data_recommend_system_spark.operators.avrocf import (
        make_avro,
        parse_avro,
    )

    schema = {"type": "record", "name": "M",
              "fields": [{"name": "name", "type": "string"},
                         {"name": "n", "type": "long"}]}
    recs = [[{"name": f"r{i}", "n": i * 3} for i in range(50)],
            [{"name": "x", "n": -9}]]
    for codec in ("snappy", "zstd"):
        m = parse_avro(make_avro(schema, recs, codec=codec))
        assert m["codec"] == codec and m["n_records"] == 51
        assert m["records"][-1] == {"name": "x", "n": -9}
    blob = bytearray(make_avro(schema, recs, codec="snappy"))
    blob[-21] ^= 1
    with pytest.raises(ValueError):
        parse_avro(bytes(blob))


# ---------------------------------------------------------------------------
# arrays (round 10 — the manifest equality_ids list)
# ---------------------------------------------------------------------------

def test_array_roundtrip():
    from hainan_big_data_recommend_system_spark.operators.avrocf import (
        make_avro,
        parse_avro,
    )

    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "ids", "type": {"type": "array", "items": "int"}},
            {"name": "opt",
             "type": ["null", {"type": "array", "items": "string"}]},
        ],
    }
    recs = [
        {"ids": [1, 2, 3], "opt": ["x"]},
        {"ids": [], "opt": None},
        {"ids": [-7], "opt": []},
    ]
    out = parse_avro(make_avro(schema, [recs]))
    assert out["records"] == recs


def test_array_negative_count_block_decodes():
    """Spec: a negative item count is followed by the block byte size."""
    from hainan_big_data_recommend_system_spark.operators.avrocf import (
        _compile_type,
        _decode_field,
        write_long,
    )

    ctype = _compile_type({"type": "array", "items": "int"})
    items = write_long(5) + write_long(6)
    neg = write_long(-2) + write_long(len(items)) + items + write_long(0)
    val, pos = _decode_field(ctype, neg, 0)
    assert val == [5, 6] and pos == len(neg)
    # bad declared size is loud
    import pytest

    broken = write_long(-2) + write_long(10 ** 6) + items + write_long(0)
    with pytest.raises(ValueError, match="block size"):
        _decode_field(ctype, broken, 0)


def test_array_overrun_count_rejected():
    from hainan_big_data_recommend_system_spark.operators.avrocf import (
        make_avro,
        parse_avro,
        write_long,
    )

    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "ids",
                    "type": {"type": "array", "items": "int"}}],
    }
    base = make_avro(schema, [[{"ids": [5]}]])
    plain = write_long(1) + write_long(5) + write_long(0)
    evil = write_long(1 << 40) + write_long(5) + write_long(0)
    assert plain in base
    import pytest

    with pytest.raises(ValueError):
        parse_avro(base.replace(plain, evil))
