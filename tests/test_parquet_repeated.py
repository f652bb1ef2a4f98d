"""Repeated (list/map) parquet leaves — Dremel reassembly in
operators/parquetfmt.py (read_list_column / read_map_column /
hand_read_table), VERDICT r8 next-round item #1.

Oracle discipline: every fixture is audited cell-for-cell against
DuckDB's native parquet reader on the SAME bytes (interop with a
native reader, not a writer→reader roundtrip).
"""

from __future__ import annotations

import io

import duckdb
import pytest

from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
    hand_read_table,
    read_list_column,
    read_map_column,
)


def _write(table, **kw) -> bytes:
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.getvalue()


def _fixture_table(n=200):
    import pyarrow as pa

    tags, nums, props, ids = [], [], [], []
    for i in range(n):
        ids.append(i)
        if i % 7 == 3:
            tags.append(None)
        elif i % 7 == 5:
            tags.append([])
        else:
            tags.append(
                [f"t{j}-{i}" if j % 3 else None for j in range(i % 5 + 1)]
            )
        nums.append(
            None if i % 11 == 9 else [i * 10 + j for j in range(i % 4)]
        )
        if i % 6 == 1:
            props.append(None)
        elif i % 6 == 4:
            props.append({})
        else:
            props.append(
                {f"k{i % 7}": f"v{i}", "common": None if i % 5 == 0
                 else str(i)}
            )
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "tags": pa.array(tags, pa.list_(pa.string())),
            "nums": pa.array(nums, pa.list_(pa.int64())),
            "props": pa.array(props, pa.map_(pa.string(), pa.string())),
        }
    ), ids, tags, nums, props


def _duck_rows(raw: bytes):
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".parquet")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(raw)
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT id, tags, nums, props FROM '{path}' ORDER BY id"
        ).fetchall()
        con.close()
    finally:
        os.unlink(path)
    return rows


def _dmap(m):
    # duckdb's python API surfaces MAP as {'key': [...], 'value': [...]}
    if m is None:
        return None
    if isinstance(m, dict) and set(m) == {"key", "value"}:
        return dict(zip(m["key"], m["value"]))
    return m


_LAYOUTS = [
    dict(compression="none"),
    dict(compression="snappy"),
    dict(compression="gzip", use_dictionary=False),
    dict(compression="zstd", data_page_version="2.0"),
    dict(compression="lz4", data_page_version="2.0", use_dictionary=False),
    dict(compression="snappy", data_page_version="2.0"),
    dict(
        compression="none",
        use_dictionary=False,
        column_encoding={
            "id": "DELTA_BINARY_PACKED",
            "tags.list.element": "DELTA_BYTE_ARRAY",
            "nums.list.element": "DELTA_BINARY_PACKED",
            "props.key_value.key": "DELTA_BYTE_ARRAY",
            "props.key_value.value": "DELTA_LENGTH_BYTE_ARRAY",
        },
    ),
]


@pytest.mark.parametrize("kw", _LAYOUTS, ids=lambda kw: "-".join(
    str(v) for v in kw.values() if not isinstance(v, dict)))
def test_list_map_decode_matches_duckdb(kw):
    table, ids, tags, nums, props = _fixture_table()
    raw = _write(table, **kw)
    got = hand_read_table(raw)
    assert got["id"] == ids
    assert got["tags"] == tags
    assert got["nums"] == nums
    assert got["props"] == props
    # independent native-reader audit on the same bytes
    for row, (rid, wt, wn, wp) in zip(range(len(ids)), _duck_rows(raw)):
        assert got["id"][row] == rid
        assert got["tags"][row] == (list(wt) if wt is not None else None)
        assert got["nums"][row] == (list(wn) if wn is not None else None)
        assert got["props"][row] == _dmap(wp)


def test_multi_row_group_and_multi_page():
    # tiny pages + row groups force records to span data pages within a
    # chunk (levels accumulate across pages before assembly) and
    # multiple row groups (records never span those)
    table, ids, tags, nums, props = _fixture_table(600)
    raw = _write(
        table, compression="snappy", row_group_size=97,
        data_page_size=256,
    )
    got = hand_read_table(raw)
    assert got["id"] == ids
    assert got["tags"] == tags
    assert got["nums"] == nums
    assert got["props"] == props


def test_direct_readers_agree_with_hand_read():
    table, ids, tags, nums, props = _fixture_table(50)
    raw = _write(table, compression="zstd")
    assert read_list_column(raw, 0, "tags") == tags
    assert read_list_column(raw, 0, "nums") == nums
    assert read_map_column(raw, 0, "props") == props


def test_nested_lists_any_depth():
    """array<array<T>> and array<array<array<T>>> rebuild as nested
    Python lists with null/empty variants at every level — audited
    against DuckDB on the same bytes, incl. record-splitting pages."""
    import pyarrow as pa

    ll, lll = [], []
    for i in range(300):
        if i % 13 == 4:
            ll.append(None)
        elif i % 13 == 8:
            ll.append([])
        else:
            ll.append([
                None if (i + j) % 7 == 3
                else ([] if (i + j) % 7 == 5
                      else [i * 10 + j * k for k in range(j % 3)])
                for j in range(i % 4 + 1)
            ])
        lll.append(
            [[[f"s{i}-{a}-{b}" for b in range(a % 2 + 1)]
              for a in range(j % 3)] for j in range(i % 3)]
            if i % 5 else None
        )
    table = pa.table({
        "id": pa.array(range(300), pa.int64()),
        "ll": pa.array(ll, pa.list_(pa.list_(pa.int64()))),
        "lll": pa.array(lll, pa.list_(pa.list_(pa.list_(pa.string())))),
    })
    for kw in [dict(compression="snappy"),
               dict(compression="zstd", data_page_version="2.0"),
               dict(compression="snappy", row_group_size=47,
                    data_page_size=256)]:
        raw = _write(table, **kw)
        got = hand_read_table(raw)
        assert got["ll"] == ll, kw
        assert got["lll"] == lll, kw
        assert read_list_column(raw, 0, "ll") == ll[
            : len(read_list_column(raw, 0, "ll"))
        ]
    # independent native-reader audit on the last layout
    import os
    import tempfile

    import duckdb

    fd, path = tempfile.mkstemp(suffix=".parquet")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(raw)
        rows = duckdb.connect().execute(
            f"SELECT id, ll, lll FROM '{path}' ORDER BY id"
        ).fetchall()
    finally:
        os.unlink(path)
    for rid, wll, wlll in rows:
        assert got["ll"][rid] == wll
        assert got["lll"][rid] == wlll


def test_map_under_repetition_quarantined():
    import pyarrow as pa

    table = pa.table({
        "lm": pa.array(
            [[{"a": 1}], [{"b": 2}, {"c": 3}]],
            pa.list_(pa.map_(pa.string(), pa.int64())),
        )
    })
    raw = _write(table, compression="snappy")
    with pytest.raises(ValueError, match="repetition level"):
        read_map_column(raw, 0, "lm")
    with pytest.raises(ValueError):
        hand_read_table(raw)


def test_list_of_structs_decodes():
    """array<struct<…>> zips field leaves into per-element dicts:
    null ELEMENTS (def below the element group) are distinguished from
    present elements with null fields; nested struct members flatten
    to dotted names — audited against DuckDB on the same bytes."""
    import os
    import tempfile

    import duckdb
    import pyarrow as pa

    ls = []
    for i in range(300):
        if i % 13 == 4:
            ls.append(None)
        elif i % 13 == 8:
            ls.append([])
        else:
            ls.append([
                None if (i + j) % 7 == 3 else
                {"x": None if (i + j) % 5 == 0 else i * 10 + j,
                 "y": None if (i + j) % 6 == 1 else f"s{i}-{j}",
                 "z": ({"a": (i + j) % 2 == 0} if (i + j) % 4
                       else None)}
                for j in range(i % 4 + 1)
            ])
    typ = pa.list_(pa.struct([
        ("x", pa.int64()), ("y", pa.string()),
        ("z", pa.struct([("a", pa.bool_())])),
    ]))
    table = pa.table({"id": pa.array(range(300), pa.int64()),
                      "ls": pa.array(ls, typ)})
    raw = _write(table, compression="snappy", row_group_size=47,
                 data_page_size=256)
    got = hand_read_table(raw)["ls"]
    assert read_list_column(raw, 0, "ls") == got[:47]
    fd, path = tempfile.mkstemp(suffix=".parquet")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(raw)
        rows = duckdb.connect().execute(
            f"SELECT id, ls FROM '{path}' ORDER BY id"
        ).fetchall()
    finally:
        os.unlink(path)
    for rid, wls in rows:
        if wls is None:
            assert got[rid] is None
            continue
        flat = [
            None if e is None else {
                "x": e["x"], "y": e["y"],
                "z.a": None if e["z"] is None else e["z"]["a"],
            }
            for e in wls
        ]
        assert got[rid] == flat, (rid, got[rid], flat)


def test_struct_list_with_inner_repetition_quarantined():
    import pyarrow as pa

    table = pa.table({
        "ls": pa.array(
            [[{"x": 1, "tags": ["a"]}]],
            pa.list_(pa.struct([("x", pa.int64()),
                                ("tags", pa.list_(pa.string()))])),
        )
    })
    raw = _write(table, compression="snappy")
    with pytest.raises(ValueError, match="out of scope"):
        read_list_column(raw, 0, "ls")


def test_scalar_contract_unchanged():
    # a repeated leaf read through the scalar path must still raise
    import pyarrow as pa

    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        read_leaf_column,
    )

    table = pa.table(
        {"tags": pa.array([["a"], ["b", "c"]], pa.list_(pa.string()))}
    )
    raw = _write(table, compression="snappy")
    with pytest.raises(ValueError, match="with_levels"):
        read_leaf_column(raw, 0, "tags.list.element")


def test_map_duplicate_keys_quarantined():
    import pyarrow as pa

    # pyarrow happily writes duplicate keys; the reader must not
    # silently last-wins them
    m = pa.MapArray.from_arrays(
        pa.array([0, 2]), pa.array(["a", "a"]), pa.array(["x", "y"])
    )
    raw = _write(pa.table({"props": m}), compression="none")
    with pytest.raises(ValueError, match="duplicate keys"):
        read_map_column(raw, 0, "props")


def test_spark_written_file_matches_duckdb(spark, tmp_path):
    import glob

    df = spark.sql(
        """
        SELECT id,
               CASE WHEN id % 4 = 2 THEN NULL
                    WHEN id % 4 = 3 THEN array()
                    ELSE transform(sequence(1, CAST(id % 5 AS INT) + 1),
                                   x -> concat('t', x, '-', id)) END AS tags,
               CASE WHEN id % 5 = 0 THEN array(id, NULL, id * 2)
                    ELSE array(id) END AS nums,
               CASE WHEN id % 3 = 0 THEN NULL
                    ELSE map(concat('k', id % 7), concat('v', id),
                             'common', CAST(id AS STRING)) END AS props
        FROM range(200)
        """
    )
    out = str(tmp_path / "sparklists")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    path = glob.glob(out + "/part-*.parquet")[0]
    raw = open(path, "rb").read()
    got = hand_read_table(raw)
    order = sorted(range(len(got["id"])), key=lambda i: got["id"][i])
    rows = _duck_rows(raw)
    for row, (rid, wt, wn, wp) in zip(order, rows):
        assert got["id"][row] == rid
        assert got["tags"][row] == (list(wt) if wt is not None else None)
        assert got["nums"][row] == (list(wn) if wn is not None else None)
        assert got["props"][row] == _dmap(wp)
