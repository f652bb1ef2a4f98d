"""Regression pins for the round-9 ADVICE findings.

- high  — als_exact candidate prune under v-ties: covered by
  tests/test_als_exact.py::test_prune_equals_crossjoin_under_v_ties.
- low 1 — deltalog.read_checkpoint_parquet must accept Delta proper's
  remove.deletionTimestamp and tolerate a missing/null remove.size.
- low 2 — filescan body_len must be octet_length (byte count), not
  character count: pinned here on a non-ASCII literal.
- low 3 — zstd Huffman literal streams must be EXACTLY consumed.
- low 4 — parquet PLAIN fixed-width / boolean pages must reject
  trailing bytes in the values section.
"""

from __future__ import annotations

import io

import pytest


# ---------------------------------------------------------------------------
# low 1: delta-io-shaped checkpoints (deletionTimestamp, no remove.size)
# ---------------------------------------------------------------------------

def _checkpoint_bytes(remove_fields, removes):
    import pyarrow as pa
    import pyarrow.parquet as pq

    adds = [{"path": "part-0.parquet", "size": 64, "numRecords": 7}]
    table = pa.table(
        {
            "add": pa.array(
                adds + [None] * len(removes),
                type=pa.struct(
                    [("path", pa.string()), ("size", pa.int64()),
                     ("numRecords", pa.int64())]
                ),
            ),
            "remove": pa.array(
                [None] * len(adds) + removes,
                type=pa.struct(remove_fields),
            ),
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf, compression="snappy")
    return buf.getvalue()


def test_checkpoint_accepts_deletion_timestamp_without_size():
    import pyarrow as pa

    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        read_checkpoint_parquet,
    )

    payload = _checkpoint_bytes(
        [("path", pa.string()), ("deletionTimestamp", pa.int64())],
        [{"path": "old.parquet", "deletionTimestamp": 1690000000000}],
    )
    live, tombstones, pv, schema, dvs, _, _, _ = read_checkpoint_parquet(payload)
    assert live == {"part-0.parquet": (64, 7)}
    # absent remove.size falls back to 0; the timestamp is the ordinal
    assert tombstones == {"old.parquet": (1690000000000, 0)}


def test_checkpoint_accepts_null_remove_size():
    import pyarrow as pa

    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        read_checkpoint_parquet,
    )

    payload = _checkpoint_bytes(
        [("path", pa.string()), ("deletionTimestamp", pa.int64()),
         ("size", pa.int64())],
        [{"path": "old.parquet", "deletionTimestamp": 42, "size": None}],
    )
    _, tombstones, _, _, _, _, _, _ = read_checkpoint_parquet(payload)
    assert tombstones == {"old.parquet": (42, 0)}


def test_checkpoint_missing_both_ordinals_rejected():
    import pyarrow as pa

    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        read_checkpoint_parquet,
    )

    payload = _checkpoint_bytes(
        [("path", pa.string()), ("size", pa.int64())],
        [{"path": "old.parquet", "size": 3}],
    )
    with pytest.raises(ValueError, match="deletion"):
        read_checkpoint_parquet(payload)


# ---------------------------------------------------------------------------
# low 3: zstd Huffman exact consumption
# ---------------------------------------------------------------------------

def _two_symbol_lut():
    from hainan_big_data_recommend_system_spark.operators.zstd import (
        _huf_build,
    )

    # one explicit weight-1 symbol; the implicit last symbol closes the
    # 1-bit tree: two symbols, one bit each
    return _huf_build([1])


def test_huffman_exact_consumption_ok():
    from hainan_big_data_recommend_system_spark.operators.zstd import (
        _huf_decode_stream,
    )

    lut, max_bits = _two_symbol_lut()
    assert max_bits == 1
    # sentinel + 3 payload bits (101): decodes symbols 1, 0, 1
    out = _huf_decode_stream(lut, max_bits, bytes([0b1101]), 3)
    assert list(out) == [1, 0, 1]


def test_huffman_leftover_bits_rejected():
    from hainan_big_data_recommend_system_spark.operators.zstd import (
        _huf_decode_stream,
    )

    lut, max_bits = _two_symbol_lut()
    # 4 payload bits but only 3 symbols requested: 1 leftover bit
    with pytest.raises(ValueError, match="not exactly consumed"):
        _huf_decode_stream(lut, max_bits, bytes([0b11010]), 3)


def test_huffman_zero_fill_overread_rejected():
    from hainan_big_data_recommend_system_spark.operators.zstd import (
        _huf_decode_stream,
    )

    lut, max_bits = _two_symbol_lut()
    # 3 payload bits but 5 symbols requested: 2 bits of zero-fill used
    # to decode past the stream start — plausible bytes, corrupt stream
    with pytest.raises(ValueError, match="not exactly consumed"):
        _huf_decode_stream(lut, max_bits, bytes([0b1101]), 5)


def test_zstd_pyarrow_interop_still_green():
    import pyarrow as pa

    from hainan_big_data_recommend_system_spark.operators.zstd import (
        zstd_decompress,
    )

    data = (b"the quick brown fox jumps over the lazy dog " * 64)[:2048]
    comp = pa.compress(data, codec="zstd", asbytes=True)
    assert zstd_decompress(comp) == data


# ---------------------------------------------------------------------------
# low 4: PLAIN pages reject trailing bytes in the values section
# ---------------------------------------------------------------------------

def test_plain_fixed_width_trailing_bytes_rejected():
    import struct

    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        _T_INT64,
        _decode_page_values,
    )

    body = struct.pack("<3q", 1, 2, 3)
    assert _decode_page_values(body, 0, 3, _T_INT64, None) == [1, 2, 3]
    with pytest.raises(ValueError, match="disagrees with value count"):
        _decode_page_values(body + b"\x00" * 8, 0, 3, _T_INT64, None)


def test_plain_boolean_trailing_bytes_rejected():
    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        _T_BOOLEAN,
        _decode_page_values,
    )

    assert _decode_page_values(b"\x05", 0, 3, _T_BOOLEAN, None) == [
        True, False, True,
    ]
    with pytest.raises(ValueError, match="disagrees with value count"):
        _decode_page_values(b"\x05\x00", 0, 3, _T_BOOLEAN, None)
