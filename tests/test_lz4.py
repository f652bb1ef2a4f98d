"""LZ4 raw-block decode (operators/lz4.py) — pyarrow interop + fuzz."""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pytest

from hainan_big_data_recommend_system_spark.operators.lz4 import (
    lz4_block_decompress,
)


def test_roundtrip_vs_pyarrow():
    codec = pa.Codec("lz4_raw")
    random.seed(1)
    cases = [
        b"", b"a", b"hello world " * 200, os.urandom(4000),
        bytes(random.choices(b"abc", k=100000)),
        b"\x00" * 70000,
        bytes(range(256)) * 100,
    ]
    for data in cases:
        assert lz4_block_decompress(
            codec.compress(data, asbytes=True)
        ) == data


def test_fuzz_valueerror_contract():
    random.seed(9)
    codec = pa.Codec("lz4_raw")
    for _ in range(500):
        blob = os.urandom(random.randint(1, 120))
        try:
            lz4_block_decompress(blob)
        except ValueError:
            pass
    for _ in range(500):
        comp = bytearray(
            codec.compress(b"abcabcabc " * random.randint(1, 400),
                           asbytes=True)
        )
        comp[random.randrange(len(comp))] ^= 1 << random.randrange(8)
        try:
            lz4_block_decompress(bytes(comp))
        except ValueError:
            pass


def test_output_guard():
    codec = pa.Codec("lz4_raw")
    comp = codec.compress(b"x" * 10000, asbytes=True)
    with pytest.raises(ValueError, match="limit"):
        lz4_block_decompress(comp, max_output=100)


def test_boolean_and_lz4_pages_read_by_hand(tmp_path):
    import pyarrow.parquet as pq
    import duckdb

    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        read_leaf_column,
    )

    n = 777
    bools = [None if i % 13 == 0 else (i % 3 == 0) for i in range(n)]
    t = pa.table({"b": pa.array(bools, pa.bool_()),
                  "i": pa.array(list(range(n)), pa.int64())})
    con = duckdb.connect()
    for i, kw in enumerate([
        dict(compression="lz4"),
        dict(compression="lz4", data_page_version="2.0"),
        dict(compression="zstd", data_page_version="2.0"),
    ]):
        path = str(tmp_path / f"b{i}.parquet")
        pq.write_table(t, path, **kw)
        raw = open(path, "rb").read()
        want = [r[0] for r in con.execute(
            f"SELECT b FROM '{path}'"
        ).fetchall()]
        got = read_leaf_column(raw, 0, "b", with_nulls=True)["values"]
        assert got == want, kw
