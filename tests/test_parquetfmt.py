"""Parquet format walk (operators/parquetfmt.py) — interop-gated in
BOTH directions: files this writer emits are read by DuckDB and
pyarrow; footers those engines' writers emit (the arrow-written
testdata) are walked by this reader and must agree with DuckDB's
native parquet_metadata()/parquet_file_metadata() cell for cell."""

from __future__ import annotations

import glob
import os
import struct

import duckdb
import pyarrow.parquet as papq
import pytest

from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
    make_parquet,
    parse_footer_tail,
    parse_parquet,
    parse_parquet_footer,
    read_footer_tail,
    read_int64_column,
    read_string_column,
)

ROWS1 = [(i * 3 - 9, f"n{i % 4}") for i in range(12)]
ROWS2 = [(-(2**40) + i, "y" * (i % 3)) for i in range(7)]


def test_roundtrip_pinned():
    m = parse_parquet(make_parquet([ROWS1, ROWS2]))
    assert m["rows"] == ROWS1 + ROWS2
    assert m["n_row_groups"] == 2 and m["n_rows"] == 19
    assert m["sum_ids"] == sum(i for i, _ in ROWS1 + ROWS2)
    # data_bytes is exactly the PLAIN geometry: 8/value + (4+len)/string
    assert m["data_bytes"] == 12 * 19 + sum(
        len(n) for _, n in ROWS1 + ROWS2
    )


def test_duckdb_reads_our_file(tmp_path):
    p = str(tmp_path / "mini.parquet")
    open(p, "wb").write(make_parquet([ROWS1, ROWS2]))
    got = duckdb.connect().execute(
        f"SELECT id, name FROM read_parquet('{p}') ORDER BY id, name"
    ).fetchall()
    assert got == sorted(ROWS1 + ROWS2)


def test_pyarrow_reads_our_file(tmp_path):
    p = str(tmp_path / "mini.parquet")
    open(p, "wb").write(make_parquet([ROWS1, ROWS2]))
    t = papq.read_table(p)
    assert t.column("id").to_pylist() == [i for i, _ in ROWS1 + ROWS2]
    assert t.column("name").to_pylist() == [n for _, n in ROWS1 + ROWS2]
    assert not t.schema.field("id").nullable


@pytest.mark.parametrize(
    "table", ["orders", "documents", "lineitem", "region"]
)
def test_real_footer_matches_duckdb_and_pyarrow(sf_oracle_dir, table):
    path = os.path.join(sf_oracle_dir, f"{table}.parquet")
    m = parse_parquet_footer(open(path, "rb").read())
    con = duckdb.connect()
    fm = con.execute(
        "SELECT num_rows, num_row_groups, created_by "
        f"FROM parquet_file_metadata('{path}')"
    ).fetchone()
    assert (m["n_rows"], m["n_row_groups"], m["created_by"]) == fm
    cm = con.execute(
        "SELECT count(*), sum(num_values), sum(total_compressed_size), "
        "       sum(total_uncompressed_size) "
        f"FROM parquet_metadata('{path}')"
    ).fetchone()
    assert (
        m["n_chunks"],
        m["num_values"],
        m["total_compressed"],
        m["total_uncompressed"],
    ) == tuple(int(x) for x in cm)
    md = papq.ParquetFile(path).metadata
    assert m["column_names"] == [
        md.schema.column(i).name for i in range(md.num_columns)
    ]
    assert m["physical_types"] == [
        md.schema.column(i).physical_type for i in range(md.num_columns)
    ]
    assert m["codecs"] == sorted(
        {
            md.row_group(r).column(c).compression
            for r in range(md.num_row_groups)
            for c in range(md.num_columns)
        }
    )


def test_footer_tail_refetches_exactly(sf_oracle_dir):
    path = os.path.join(sf_oracle_dir, "orders.parquet")
    raw = open(path, "rb").read()
    calls = []

    def fetch(off, ln):
        calls.append((off, ln))
        return raw[off : off + ln]

    tail = read_footer_tail(fetch, len(raw), probe=64)  # < footer size
    assert len(calls) == 2  # probe, then one exact ranged re-read
    flen = struct.unpack("<I", raw[-8:-4])[0]
    assert len(tail) == flen + 8
    assert parse_footer_tail(tail) == parse_parquet_footer(raw)


def test_out_of_scope_quarantines(sf_oracle_dir):
    raw = open(
        os.path.join(sf_oracle_dir, "orders.parquet"), "rb"
    ).read()
    with pytest.raises(ValueError):  # snappy + dictionary: footer-only
        parse_parquet(raw)


def test_parquet_file_stats_matches_duckdb(spark, sf_oracle_dir):
    """The path-parameterized oracle for the rows-only catalog entry:
    the Spark query's every cell vs DuckDB's native parquet reader."""
    from hainan_big_data_recommend_system_spark.qcatalog import (
        EXTRA_REGISTRY,
    )

    got = {
        r["file_name"]: r
        for r in EXTRA_REGISTRY["parquet_file_stats"]
        .fn(spark, sf_oracle_dir)
        .collect()
    }
    paths = sorted(glob.glob(os.path.join(sf_oracle_dir, "*.parquet")))
    assert sorted(got) == [os.path.basename(p) for p in paths]
    con = duckdb.connect()
    for p in paths:
        r = got[os.path.basename(p)]
        fm = con.execute(
            "SELECT num_rows, num_row_groups, created_by "
            f"FROM parquet_file_metadata('{p}')"
        ).fetchone()
        assert (r["n_rows"], r["n_row_groups"], r["created_by"]) == fm
        cm = con.execute(
            "SELECT count(*), count(DISTINCT path_in_schema), "
            "       sum(num_values), sum(total_compressed_size), "
            "       sum(total_uncompressed_size) "
            f"FROM parquet_metadata('{p}')"
        ).fetchone()
        assert (
            r["n_chunks"],
            r["n_columns"],
            r["num_values"],
            r["total_compressed"],
            r["total_uncompressed"],
        ) == tuple(int(x) for x in cm)


def test_statistics_roundtrip_and_interop(tmp_path):
    """min_value/max_value Statistics + ColumnOrder written by
    make_parquet must round-trip through our own footer walk AND be
    trusted by pyarrow and DuckDB (arrow ignores stats unless the
    column order is declared TYPE_ORDER)."""
    b = make_parquet([ROWS1, ROWS2])
    st = parse_parquet_footer(b)["int64_stats"]
    assert st == [
        {"rg": 0, "col": "id", "min": -9, "max": 24},
        {"rg": 1, "col": "id", "min": -(2**40), "max": -(2**40) + 6},
    ]
    p = str(tmp_path / "s.parquet")
    open(p, "wb").write(b)
    pa_st = papq.ParquetFile(p).metadata.row_group(0).column(0).statistics
    assert (pa_st.min, pa_st.max, pa_st.has_min_max) == (-9, 24, True)
    got = duckdb.connect().execute(
        "SELECT row_group_id, stats_min_value, stats_max_value "
        f"FROM parquet_metadata('{p}') WHERE path_in_schema = 'id' "
        "ORDER BY row_group_id"
    ).fetchall()
    assert got == [(0, "-9", "24"), (1, str(-(2**40)), str(-(2**40) + 6))]


def test_real_file_int64_stats_match_pyarrow(sf_oracle_dir):
    path = os.path.join(sf_oracle_dir, "orders.parquet")
    ours = {
        (s["rg"], s["col"]): (s["min"], s["max"])
        for s in parse_parquet_footer(open(path, "rb").read())["int64_stats"]
    }
    md = papq.ParquetFile(path).metadata
    want = {}
    for r in range(md.num_row_groups):
        for c in range(md.num_columns):
            col = md.row_group(r).column(c)
            if col.physical_type == "INT64" and col.statistics.has_min_max:
                want[(r, col.path_in_schema)] = (
                    col.statistics.min,
                    col.statistics.max,
                )
    # timestamps: pyarrow surfaces logical values; compare raw int64
    # columns only (o_orderkey / o_custkey style keys)
    for k, v in want.items():
        if isinstance(v[0], int):
            assert ours[k] == v, k


def test_thrift_codec_roundtrip_random_structs():
    """Seeded-random thrift compact structures (nested structs, lists,
    binaries, zigzag ints across width boundaries, long-form field-id
    deltas) must decode back exactly — the generic walk is what every
    real footer rides."""
    import random

    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        _CT_BINARY,
        _CT_I64,
        _CT_LIST,
        _CT_STRUCT,
        _read_struct,
        _tstruct,
    )

    rng = random.Random(99)

    def rand_fields(depth):
        fields = []
        fid = 0
        expect = {}
        for _ in range(rng.randrange(1, 6)):
            fid += rng.choice([1, 2, 15, 16, 40])  # exercise long form
            kind = rng.randrange(4 if depth < 3 else 3)
            if kind == 0:
                v = rng.choice(
                    [0, -1, 1, 2**31, -(2**31), 2**62, -(2**62)]
                )
                fields.append((fid, _CT_I64, v))
                expect[fid] = v
            elif kind == 1:
                v = bytes(rng.randrange(256) for _ in range(rng.randrange(9)))
                fields.append((fid, _CT_BINARY, v))
                expect[fid] = v
            elif kind == 2:
                vs = [rng.randrange(-100, 100) for _ in range(rng.randrange(20))]
                fields.append((fid, _CT_LIST, (_CT_I64, vs)))
                expect[fid] = vs
            else:
                sub, sub_expect = rand_fields(depth + 1)
                fields.append((fid, _CT_STRUCT, sub))
                expect[fid] = sub_expect
        return _tstruct(fields), expect

    for _ in range(200):
        blob, want = rand_fields(0)
        got, pos = _read_struct(blob, 0, 0)
        assert pos == len(blob)
        assert got == want


def test_read_int64_column_matches_duckdb_on_real_files(sf_oracle_dir):
    """The flagship interop gate: hand-decoded snappy + dictionary +
    level walks of REAL arrow files equal DuckDB's native reads,
    column for column (timestamps compared in raw epoch micros)."""
    con = duckdb.connect()
    for table in ("orders", "lineitem", "events"):
        path = os.path.join(sf_oracle_dir, f"{table}.parquet")
        raw = open(path, "rb").read()
        meta = parse_parquet_footer(raw)
        for name, t in zip(meta["column_names"], meta["physical_types"]):
            if t != "INT64":
                continue
            got = read_int64_column(raw, 0, name)
            typ = con.execute(
                f"SELECT typeof({name}) FROM '{path}' LIMIT 1"
            ).fetchone()[0]
            expr = (
                f"CAST(epoch_us({name}) AS HUGEINT)"
                if "TIMESTAMP" in typ
                else name
            )
            n, s = con.execute(
                f"SELECT count({name}), coalesce(sum({expr}), 0) "
                f"FROM '{path}'"
            ).fetchone()
            assert (got["n_values"], sum(got["values"])) == (
                int(n),
                int(s),
            ), (table, name)


def test_read_int64_column_own_writer_and_errors(tmp_path):
    b = make_parquet([ROWS1, ROWS2])
    r = read_int64_column(b, 0, "id")
    assert r["values"] == [i for i, _ in ROWS1] and r["n_nulls"] == 0
    with pytest.raises(ValueError):
        read_int64_column(b, 0, "name")  # BYTE_ARRAY
    with pytest.raises(ValueError):
        read_int64_column(b, 5, "id")  # row group out of range
    with pytest.raises(ValueError):
        read_int64_column(b, 0, "missing")


def test_parquet_page_scan_matches_duckdb(spark, sf_oracle_dir):
    from hainan_big_data_recommend_system_spark.qcatalog import (
        EXTRA_REGISTRY,
    )

    rows = (
        EXTRA_REGISTRY["parquet_page_scan"]
        .fn(spark, sf_oracle_dir)
        .collect()
    )
    assert rows
    con = duckdb.connect()
    for r in rows:
        path = os.path.join(sf_oracle_dir, r["file_name"])
        typ = con.execute(
            f"SELECT typeof({r['col']}) FROM '{path}' LIMIT 1"
        ).fetchone()[0]
        expr = (
            f"CAST(epoch_us({r['col']}) AS HUGEINT)"
            if "TIMESTAMP" in typ
            else r["col"]
        )
        n, s = con.execute(
            f"SELECT count({r['col']}), coalesce(sum({expr}), 0) "
            f"FROM '{path}'"
        ).fetchone()
        assert (r["n_values"], int(r["sum_values"])) == (
            int(n),
            int(s),
        ), r


def test_read_string_column_matches_duckdb_digests(sf_oracle_dir):
    """BYTE_ARRAY chunks: hand-decoded dictionary strings must equal
    DuckDB's read VALUE-FOR-VALUE — compared via an order-insensitive
    md5 digest over the full column, not just counts."""
    import hashlib

    con = duckdb.connect()
    cases = [
        ("orders", "o_orderstatus"),
        ("orders", "o_orderpriority"),
        ("documents", "lang"),
        ("lineitem", "l_returnflag"),
    ]
    for table, col in cases:
        path = os.path.join(sf_oracle_dir, f"{table}.parquet")
        got = read_string_column(open(path, "rb").read(), 0, col)
        n, blen = con.execute(
            f"SELECT count({col}), coalesce(sum(strlen({col})), 0) "
            f"FROM '{path}'"
        ).fetchone()
        assert got["n_values"] == int(n)
        assert sum(len(v.encode()) for v in got["values"]) == int(blen)
        dd = con.execute(
            f"SELECT md5(string_agg({col}, chr(1) ORDER BY {col})) "
            f"FROM '{path}'"
        ).fetchone()[0]
        mh = hashlib.md5(
            "\x01".join(sorted(got["values"])).encode()
        ).hexdigest()
        assert dd == mh, (table, col)
    # own-writer REQUIRED path and the type gate
    b = make_parquet([ROWS1])
    assert read_string_column(b, 0, "name")["values"] == [
        n for _, n in ROWS1
    ]
    with pytest.raises(ValueError):
        read_string_column(b, 0, "id")


def test_modern_writer_matrix_zstd_v2_delta(tmp_path):
    """Round-8 modern-writer coverage: zstd pages (hand RFC 8878
    decode), DataPageV2 headers (uncompressed level runs, separate
    lengths), and the DELTA_* encodings — every (codec, page version,
    encoding) combination written by pyarrow, every cell equal to
    DuckDB's native read of the same file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        read_leaf_column,
    )

    ids = list(range(0, 3000, 3))
    names = [f"name-{i % 97}" for i in range(1000)]
    vals = [None if i % 7 == 0 else i * 11 for i in range(1000)]
    t = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "name": pa.array(names),
            "v": pa.array(vals, pa.int64()),
        }
    )
    combos = [
        dict(compression="zstd"),
        dict(compression="zstd", data_page_version="2.0"),
        dict(compression="snappy", data_page_version="2.0"),
        dict(compression="zstd", use_dictionary=False,
             data_page_version="2.0",
             column_encoding={"id": "DELTA_BINARY_PACKED",
                              "name": "DELTA_BYTE_ARRAY",
                              "v": "DELTA_BINARY_PACKED"}),
        dict(compression="none", use_dictionary=False,
             data_page_version="2.0",
             column_encoding={"id": "DELTA_BINARY_PACKED",
                              "name": "DELTA_LENGTH_BYTE_ARRAY",
                              "v": "PLAIN"}),
        dict(compression="zstd", use_dictionary=False,
             data_page_version="1.0",
             column_encoding={"id": "DELTA_BINARY_PACKED",
                              "name": "DELTA_BYTE_ARRAY",
                              "v": "DELTA_BINARY_PACKED"}),
    ]
    con = duckdb.connect()
    for i, kw in enumerate(combos):
        path = str(tmp_path / f"m{i}.parquet")
        pq.write_table(t, path, **kw)
        raw = open(path, "rb").read()
        want_id, want_nm, want_v = zip(
            *con.execute(f"SELECT id, name, v FROM '{path}'").fetchall()
        )
        assert read_leaf_column(raw, 0, "id")["values"] == list(want_id), kw
        assert read_leaf_column(raw, 0, "name")["values"] == list(want_nm), kw
        got_v = read_leaf_column(raw, 0, "v", with_nulls=True)["values"]
        assert got_v == list(want_v), kw
        # footer walk agrees with duckdb's parquet_metadata on the codec
        meta = parse_parquet_footer(raw)
        want_codecs = {
            r[0]
            for r in con.execute(
                "SELECT DISTINCT compression FROM parquet_metadata(?)", [path]
            ).fetchall()
        }
        assert set(meta["codecs"]) == want_codecs, kw


def test_struct_leaf_columns_delta_checkpoint_shape(tmp_path):
    """Dotted struct-leaf reads (the Delta checkpoint layout): pyarrow
    writes struct<...> columns; the hand decoder reads each leaf by its
    dotted path with null alignment."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        read_leaf_column,
    )

    add = pa.array(
        [{"path": f"f{i}", "size": 10 * i, "numRecords": i} if i % 3 else None
         for i in range(200)],
        type=pa.struct([("path", pa.string()), ("size", pa.int64()),
                        ("numRecords", pa.int64())]),
    )
    t = pa.table({"add": add})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="zstd", data_page_version="2.0")
    raw = buf.getvalue()
    want = [r["path"] if r is not None else None for r in add.to_pylist()]
    assert read_leaf_column(raw, 0, "add.path", with_nulls=True)["values"] == want
    want_sz = [r["size"] if r is not None else None for r in add.to_pylist()]
    assert read_leaf_column(raw, 0, "add.size", with_nulls=True)["values"] == want_sz
    with pytest.raises(ValueError):
        read_leaf_column(raw, 0, "add")  # not a leaf


def test_full_type_codec_matrix_int32_float_gzip_bss(tmp_path):
    """Round-8 completion: INT32 (incl. date32 storage), FLOAT, DOUBLE
    leaf types; GZIP pages (stdlib zlib, full gzip member per page);
    BYTE_STREAM_SPLIT float encoding — every cell vs DuckDB."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        read_leaf_column,
    )

    n = 500
    i32 = [i * 7 - 300 if i % 11 else None for i in range(n)]
    f64 = [i / 7.0 for i in range(n)]
    f32 = [float(f"{math.sin(i):.4f}") for i in range(n)]
    dates = list(range(19000, 19000 + n))
    t = pa.table({
        "i32": pa.array(i32, pa.int32()),
        "f32": pa.array(f32, pa.float32()),
        "f64": pa.array(f64, pa.float64()),
        "d": pa.array(dates, pa.date32()),
    })
    con = duckdb.connect()
    combos = [
        dict(compression="gzip"),
        dict(compression="gzip", data_page_version="2.0",
             use_dictionary=False),
        dict(compression="zstd", use_dictionary=False,
             data_page_version="2.0",
             column_encoding={"i32": "DELTA_BINARY_PACKED",
                              "f32": "BYTE_STREAM_SPLIT",
                              "f64": "BYTE_STREAM_SPLIT",
                              "d": "DELTA_BINARY_PACKED"}),
    ]
    for i, kw in enumerate(combos):
        path = str(tmp_path / f"t{i}.parquet")
        pq.write_table(t, path, **kw)
        raw = open(path, "rb").read()
        want = con.execute(
            f"SELECT i32, f32, f64, d - DATE '1970-01-01' FROM '{path}'"
        ).fetchall()
        wi, wf32, wf64, wd = (list(c) for c in zip(*want))
        assert read_leaf_column(raw, 0, "i32", with_nulls=True)[
            "values"
        ] == wi, kw
        got32 = read_leaf_column(raw, 0, "f32")["values"]
        assert all(abs(a - b) < 1e-6 for a, b in zip(got32, wf32)), kw
        assert read_leaf_column(raw, 0, "f64")["values"] == wf64, kw
        assert read_leaf_column(raw, 0, "d")["values"] == wd, kw


def test_delta_binary_packed_int64_extremes_wrap(tmp_path):
    """Round-8 self-review #1: Encodings.md defines DELTA accumulation
    mod 2^64 — int64-extreme columns must decode exactly, never escape
    the domain."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        read_leaf_column,
    )

    vals = [2**63 - 1, -(2**63), 5, -7, 2**63 - 2, 0, -(2**63) + 1]
    sch = pa.schema([pa.field("id", pa.int64(), nullable=False)])
    path = str(tmp_path / "x.parquet")
    pq.write_table(
        pa.table({"id": pa.array(vals, pa.int64())}, schema=sch), path,
        use_dictionary=False, compression="none",
        column_encoding={"id": "DELTA_BINARY_PACKED"},
    )
    raw = open(path, "rb").read()
    got = read_leaf_column(raw, 0, "id")["values"]
    assert got == vals
    want = duckdb.connect().execute(
        f"SELECT id FROM '{path}'"
    ).fetchall()
    assert got == [r[0] for r in want]


def test_delta_binary_packed_crafted_block_size_rejected():
    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        delta_binary_unpack,
    )
    from hainan_big_data_recommend_system_spark.operators.pbwire import (
        write_varint,
        zigzag_encode,
    )

    bomb = (
        write_varint(1 << 40) + write_varint(1) + write_varint(2)
        + write_varint(zigzag_encode(0))
    )
    with pytest.raises(ValueError, match="implausible"):
        delta_binary_unpack(bytes(bomb) + b"\x00" * 16, 0)


def test_decimal_flba_and_int96_timestamps(tmp_path):
    """Round-8: DECIMAL's FLBA physical layout (big-endian
    two's-complement unscaled ints) and legacy INT96 timestamps
    (Julian day + nanos → epoch micros) — gated against DuckDB reading
    the same files."""
    import datetime
    import decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        read_leaf_column,
    )

    decs = [
        None if i % 13 == 0 else decimal.Decimal(f"{i * 7 - 300}.{i % 100:02d}")
        for i in range(300)
    ]
    ts = [
        datetime.datetime(2021, 1, 1)
        + datetime.timedelta(seconds=i * 12345, microseconds=i * 7)
        for i in range(300)
    ]
    t = pa.table({
        "d": pa.array(decs, pa.decimal128(12, 2)),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    con = duckdb.connect()
    for i, kw in enumerate([
        dict(compression="zstd", use_deprecated_int96_timestamps=True),
        dict(compression="snappy", data_page_version="2.0",
             use_deprecated_int96_timestamps=True),
    ]):
        path = str(tmp_path / f"d{i}.parquet")
        pq.write_table(t, path, **kw)
        raw = open(path, "rb").read()
        want_d = [
            None if r[0] is None else int(r[0] * 100)
            for r in con.execute(f"SELECT d FROM '{path}'").fetchall()
        ]
        got_d = read_leaf_column(raw, 0, "d", with_nulls=True)["values"]
        assert got_d == want_d, kw
        want_ts = [
            int(r[0])
            for r in con.execute(
                f"SELECT epoch_us(ts) FROM '{path}'"
            ).fetchall()
        ]
        assert read_leaf_column(raw, 0, "ts")["values"] == want_ts, kw


def test_hand_read_table_reproduces_real_testdata_files(sf_oracle_dir):
    """The audit capstone: the hand reader reproduces whole REAL
    arrow-written testdata files cell-for-cell (every leaf column,
    every row group) against DuckDB's native read."""
    import datetime

    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        hand_read_table,
    )

    con = duckdb.connect()
    for t in ("region", "nation", "supplier", "orders"):
        path = os.path.join(sf_oracle_dir, f"{t}.parquet")
        got = hand_read_table(open(path, "rb").read())
        cols = list(got)
        for c in cols:
            typ = con.execute(
                f"SELECT typeof({c}) FROM '{path}' LIMIT 1"
            ).fetchone()[0]
            expr = f"epoch_us({c})" if "TIMESTAMP" in typ else c
            want = [
                r[0]
                for r in con.execute(
                    f"SELECT {expr} FROM '{path}'"
                ).fetchall()
            ]
            assert got[c] == want, (t, c)
