"""Parquet format walk — the lake format itself, read by hand.

Parquet files end with ``<footer thrift> <4-byte LE footer length>
"PAR1"``; the footer is a ``FileMetaData`` message in the THRIFT
COMPACT PROTOCOL (field-delta headers, zigzag varint ints, nested
structs/lists), which this module decodes generically — so the footer
of ANY real parquet file (arrow, Spark, DuckDB writers; snappy or zstd
data; dictionary encodings) walks, because footer parsing never touches
page data.  On top of the generic walk:

- :func:`parse_parquet_footer` — structural metadata for any file:
  rows, row groups, leaf columns, per-chunk codec/encoding/size/value
  counts, null counts.  Interop-gated in tests against BOTH DuckDB's
  native ``parquet_metadata()`` and pyarrow on the driver testdata.
- :func:`make_parquet` / :func:`parse_parquet` — a real mini-writer and
  full reader for the honest scope ``struct<id:int64 required,
  name:utf8 required>``, UNCOMPRESSED, PLAIN v1 data pages (required
  fields ⇒ max def/rep level 0 ⇒ no level runs).  Writer output is
  read back by DuckDB and pyarrow in tests.
- :func:`read_int64_column` — REAL arrow-written column chunks decoded
  end-to-end: snappy blocks (operators/snappy.py), PLAIN dictionary
  pages + RLE_DICTIONARY indices, hybrid definition levels for
  optional fields.  Count/sum pinned against DuckDB reading the same
  files.  Out-of-scope codecs/encodings/page kinds raise ValueError.
- :func:`read_list_column` / :func:`read_map_column` /
  :func:`hand_read_table` — repeated (list/map) leaves via Dremel
  record reassembly (round 9): repetition levels decode in v1 AND v2
  pages, ``array<T>`` (nested to ANY depth), ``array<struct<…>>``
  (field leaves zipped per element, null elements distinguished from
  all-null fields by def level) and ``map<K,V>`` columns rebuild per
  row across page boundaries, audited cell-for-cell against DuckDB on
  pyarrow- and Spark-written fixtures.  Maps under repetition and
  repeated fields INSIDE a list's struct stay loud quarantines.

Public knowledge: the parquet-format specification
(github.com/apache/parquet-format: Thrift definitions + Encodings.md)
and the Thrift compact-protocol spec.  Reference parity: the reference
stores everything in CSV/pickle (e.g. data_clean.py writing csv);
this engine's lake-native equivalent needs parquet introspection for
file-skipping audits and ingest validation at 100 TB.
"""

from __future__ import annotations

import struct

from .pbwire import read_varint, write_varint, zigzag_decode, zigzag_encode

_MAGIC = b"PAR1"

# thrift compact element/field types
_CT_TRUE, _CT_FALSE, _CT_BYTE = 1, 2, 3
_CT_I16, _CT_I32, _CT_I64, _CT_DOUBLE = 4, 5, 6, 7
_CT_BINARY, _CT_LIST, _CT_SET, _CT_MAP, _CT_STRUCT = 8, 9, 10, 11, 12

_PHYSICAL = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
    4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}
_CODECS = {
    0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
    4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW",
}
_ENCODINGS = {
    0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE", 4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED", 6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY", 8: "RLE_DICTIONARY", 9: "BYTE_STREAM_SPLIT",
}
_T_INT64, _T_BYTE_ARRAY = 2, 6
_T_INT32, _T_FLOAT, _T_DOUBLE = 1, 4, 5
_T_BOOLEAN, _T_INT96, _T_FLBA = 0, 3, 7
_JULIAN_EPOCH_DAY = 2440588  # 1970-01-01 as a Julian day number
#: fixed byte widths for the non-BYTE_ARRAY leaf types in decode scope
_FIXED_WIDTH = {_T_INT32: 4, _T_INT64: 8, _T_FLOAT: 4, _T_DOUBLE: 8}
_STRUCT_FMT = {_T_INT32: "i", _T_INT64: "q", _T_FLOAT: "f", _T_DOUBLE: "d"}
_PAGE_DATA, _PAGE_INDEX, _PAGE_DICT, _PAGE_DATA_V2 = 0, 1, 2, 3


# ---------------------------------------------------------------------------
# thrift compact protocol — generic reader
# ---------------------------------------------------------------------------

def _read_struct(buf: bytes, pos: int, depth: int) -> tuple[dict, int]:
    """Field id -> python value.  Duplicate ids keep the last value
    (parquet metadata never repeats a field)."""
    if depth > 40:
        raise ValueError("thrift nesting too deep")
    out: dict[int, object] = {}
    last_fid = 0
    while True:
        if pos >= len(buf):
            raise ValueError("thrift struct unterminated")
        head = buf[pos]
        pos += 1
        if head == 0:
            return out, pos
        delta, ctype = head >> 4, head & 0x0F
        if delta == 0:
            raw, pos = read_varint(buf, pos)
            fid = zigzag_decode(raw)
        else:
            fid = last_fid + delta
        last_fid = fid
        val, pos = _read_value(buf, pos, ctype, depth)
        out[fid] = val


def _read_list_elem(buf: bytes, pos: int, etype: int, depth: int):
    # container booleans are one byte (1=true, 0/2=false across impls)
    if etype in (_CT_TRUE, _CT_FALSE):
        if pos >= len(buf):
            raise ValueError("thrift bool element truncated")
        return buf[pos] == 1, pos + 1
    return _read_value(buf, pos, etype, depth)


def _read_value(buf: bytes, pos: int, ctype: int, depth: int):
    if ctype == _CT_TRUE:
        return True, pos
    if ctype == _CT_FALSE:
        return False, pos
    if ctype == _CT_BYTE:
        if pos >= len(buf):
            raise ValueError("thrift i8 truncated")
        v = buf[pos]
        return (v - 256 if v >= 128 else v), pos + 1
    if ctype in (_CT_I16, _CT_I32, _CT_I64):
        raw, pos = read_varint(buf, pos)
        return zigzag_decode(raw), pos
    if ctype == _CT_DOUBLE:
        if pos + 8 > len(buf):
            raise ValueError("thrift double truncated")
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if ctype == _CT_BINARY:
        ln, pos = read_varint(buf, pos)
        if ln > len(buf) - pos:
            raise ValueError("thrift binary overruns buffer")
        return bytes(buf[pos : pos + ln]), pos + ln
    if ctype in (_CT_LIST, _CT_SET):
        if pos >= len(buf):
            raise ValueError("thrift list header truncated")
        head = buf[pos]
        pos += 1
        size, etype = head >> 4, head & 0x0F
        if size == 15:
            size, pos = read_varint(buf, pos)
        if size > len(buf) - pos:  # every element costs >= 1 byte
            raise ValueError("thrift list size overruns buffer")
        out = []
        for _ in range(size):
            v, pos = _read_list_elem(buf, pos, etype, depth + 1)
            out.append(v)
        return out, pos
    if ctype == _CT_MAP:
        size, pos = read_varint(buf, pos)
        if size == 0:
            return {}, pos
        if pos >= len(buf):
            raise ValueError("thrift map header truncated")
        kv = buf[pos]
        pos += 1
        if 2 * size > len(buf) - pos:
            raise ValueError("thrift map size overruns buffer")
        kt, vt = kv >> 4, kv & 0x0F
        out = {}
        for _ in range(size):
            k, pos = _read_list_elem(buf, pos, kt, depth + 1)
            v, pos = _read_list_elem(buf, pos, vt, depth + 1)
            if isinstance(k, (dict, list)):
                raise ValueError("thrift map key is a container")
            out[k] = v
        return out, pos
    if ctype == _CT_STRUCT:
        return _read_struct(buf, pos, depth + 1)
    raise ValueError(f"unknown thrift compact type {ctype}")


def _need_int(v, what: str) -> int:
    if not isinstance(v, int) or isinstance(v, bool):
        raise ValueError(f"{what} is not an integer")
    return v


def _need_list(v, what: str) -> list:
    if not isinstance(v, list):
        raise ValueError(f"{what} is not a list")
    return v


def _need_struct(v, what: str) -> dict:
    if not isinstance(v, dict):
        raise ValueError(f"{what} is not a struct")
    return v


# ---------------------------------------------------------------------------
# thrift compact protocol — writer (fixture scope)
# ---------------------------------------------------------------------------

def _tstruct(fields: list[tuple[int, int, object]]) -> bytes:
    """Encode ``(field_id, compact_type, value)`` triples (ascending
    ids) as a compact-protocol struct.  Bools pass ctype _CT_TRUE with
    a bool value; lists pass ``(elem_type, [elems])``."""
    out = bytearray()
    last = 0
    for fid, ctype, val in fields:
        if ctype in (_CT_TRUE, _CT_FALSE):
            ctype = _CT_TRUE if val else _CT_FALSE
        delta = fid - last
        if 1 <= delta <= 15:
            out.append((delta << 4) | ctype)
        else:
            out.append(ctype)
            out += write_varint(zigzag_encode(fid))
        last = fid
        _w_value(out, ctype, val)
    out.append(0)
    return bytes(out)


def _w_value(out: bytearray, ctype: int, val) -> None:
    if ctype in (_CT_TRUE, _CT_FALSE):
        return  # encoded in the field header nibble
    if ctype == _CT_BYTE:
        out.append(val & 0xFF)
    elif ctype in (_CT_I16, _CT_I32, _CT_I64):
        out += write_varint(zigzag_encode(val))
    elif ctype == _CT_DOUBLE:
        out += struct.pack("<d", val)
    elif ctype == _CT_BINARY:
        raw = val.encode("utf-8") if isinstance(val, str) else val
        out += write_varint(len(raw))
        out += raw
    elif ctype in (_CT_LIST, _CT_SET):
        etype, elems = val
        if len(elems) < 15:
            out.append((len(elems) << 4) | etype)
        else:
            out.append(0xF0 | etype)
            out += write_varint(len(elems))
        for e in elems:
            _w_value(out, etype, e)
    elif ctype == _CT_STRUCT:
        out += val  # pre-encoded struct bytes from _tstruct
    else:
        raise ValueError(f"writer does not emit compact type {ctype}")


# ---------------------------------------------------------------------------
# footer interpretation (any parquet file)
# ---------------------------------------------------------------------------

def parse_parquet_footer(payload: bytes) -> dict:
    """Structural metadata from the footer alone — no page decode, so
    codecs/encodings beyond the writer scope are fine.  Returns
    ``{version, created_by, n_rows, n_row_groups, column_names,
    physical_types, codecs, encodings, n_chunks, num_values,
    total_compressed, total_uncompressed, null_count, rg_rows,
    int64_stats}`` (per-chunk INT64 min/max, modern min_value/max_value
    with the legacy max/min fallback)."""
    if len(payload) < 12:
        raise ValueError("parquet file too short")
    if payload[:4] != _MAGIC or payload[-4:] != _MAGIC:
        raise ValueError("not a parquet file (bad magic)")
    flen = struct.unpack("<I", payload[-8:-4])[0]
    fstart = len(payload) - 8 - flen
    if fstart < 4:
        raise ValueError("footer length out of bounds")
    fmd, consumed = _read_struct(payload[fstart : len(payload) - 8], 0, 0)
    if consumed != flen:
        raise ValueError("footer has trailing bytes after FileMetaData")
    version = _need_int(fmd.get(1), "version")
    n_rows = _need_int(fmd.get(3), "num_rows")
    created = fmd.get(6)
    if created is not None and not isinstance(created, bytes):
        raise ValueError("created_by is not a string")
    names: list[str] = []
    types: list[str] = []
    for el in _need_list(fmd.get(2), "schema"):
        el = _need_struct(el, "schema element")
        if 1 not in el:  # group node (root / nested struct)
            continue
        t = _need_int(el[1], "schema element type")
        if t not in _PHYSICAL:
            raise ValueError(f"unknown physical type {t}")
        nm = el.get(4)
        if not isinstance(nm, bytes):
            raise ValueError("schema element missing name")
        names.append(nm.decode("utf-8", "strict"))
        types.append(_PHYSICAL[t])
    codecs: set[str] = set()
    encodings: set[str] = set()
    n_chunks = num_values = comp = uncomp = 0
    nulls = 0
    have_nulls = False
    rg_rows: list[int] = []
    int64_stats: list[dict] = []
    binary_stats: list[dict] = []
    null_stats: list[dict] = []
    bloom_offsets: list[dict] = []
    for rg_idx, rg in enumerate(_need_list(fmd.get(4), "row_groups")):
        rg = _need_struct(rg, "row group")
        rg_rows.append(_need_int(rg.get(3), "row group num_rows"))
        for ch in _need_list(rg.get(1), "row group columns"):
            ch = _need_struct(ch, "column chunk")
            md = _need_struct(ch.get(3), "column metadata")
            c = _need_int(md.get(4), "codec")
            if c not in _CODECS:
                raise ValueError(f"unknown codec {c}")
            codecs.add(_CODECS[c])
            for e in _need_list(md.get(2), "encodings"):
                e = _need_int(e, "encoding")
                if e not in _ENCODINGS:
                    raise ValueError(f"unknown encoding {e}")
                encodings.add(_ENCODINGS[e])
            n_chunks += 1
            num_values += _need_int(md.get(5), "num_values")
            uncomp += _need_int(md.get(6), "total_uncompressed_size")
            comp += _need_int(md.get(7), "total_compressed_size")
            stats = md.get(12)
            if stats is not None:
                stats = _need_struct(stats, "statistics")
                if 3 in stats:
                    nc = _need_int(stats[3], "null_count")
                    nulls += nc
                    have_nulls = True
                    # per-column null counts (round 13): the
                    # add.stats nullCount input — recorded even for
                    # chunks with NO min/max (an all-null chunk has
                    # a null_count and nothing else).  Nested leaves
                    # (path_in_schema longer than 1) are SKIPPED, not
                    # attributed to the root (ADVICE r13 low: a
                    # struct a<b>'s leaf nulls are nulls(a.b), not
                    # nulls(a) — naming them 'a' would let the
                    # IS NOT NULL lever skip files whose a is
                    # everywhere non-null but a.b all-null)
                    _p = md.get(3)
                    if (isinstance(_p, list) and len(_p) == 1
                            and isinstance(_p[0], bytes)):
                        null_stats.append({
                            "rg": rg_idx,
                            "col": _p[0].decode("utf-8", "replace"),
                            "nulls": nc,
                        })
                # min_value/max_value of INT64 chunks: the row-group
                # skipping inputs (8-byte LE two's complement).  Older
                # writers carry only the legacy max/min (fields 1/2),
                # whose ordering is identical for signed int64
                mx = stats.get(5) if isinstance(stats.get(5), bytes) \
                    else stats.get(1)
                mn = stats.get(6) if isinstance(stats.get(6), bytes) \
                    else stats.get(2)
                path = md.get(3)
                col = (
                    path[0].decode("utf-8", "replace")
                    if isinstance(path, list)
                    and path
                    and isinstance(path[0], bytes)
                    else "?"
                )
                ctype = _need_int(md.get(1), "chunk type")
                if (
                    ctype == _T_INT64
                    and isinstance(mx, bytes)
                    and isinstance(mn, bytes)
                    and len(mx) == 8
                    and len(mn) == 8
                ):
                    int64_stats.append(
                        {
                            "rg": rg_idx,
                            "col": col,
                            "min": struct.unpack("<q", mn)[0],
                            "max": struct.unpack("<q", mx)[0],
                        }
                    )
                elif ctype == _T_BYTE_ARRAY:
                    # BYTE_ARRAY bounds: ONLY the modern
                    # min_value/max_value fields (5/6) — the legacy
                    # max/min (1/2) used signed-byte ordering for
                    # binary, which is wrong for UTF-8 ranges, so
                    # they are never trusted here
                    mxm, mnm = stats.get(5), stats.get(6)
                    if isinstance(mxm, bytes) and isinstance(mnm, bytes):
                        binary_stats.append(
                            {"rg": rg_idx, "col": col,
                             "min": mnm, "max": mxm}
                        )
            bf_off = md.get(14)  # bloom_filter_offset
            if isinstance(bf_off, int) and not isinstance(bf_off, bool):
                path = md.get(3)
                bcol = (
                    path[0].decode("utf-8", "replace")
                    if isinstance(path, list)
                    and path
                    and isinstance(path[0], bytes)
                    else "?"
                )
                entry = {"rg": rg_idx, "col": bcol, "offset": bf_off}
                bf_len = md.get(15)  # bloom_filter_length (newer)
                if isinstance(bf_len, int) and not isinstance(
                    bf_len, bool
                ):
                    entry["length"] = bf_len
                bloom_offsets.append(entry)
    return {
        "version": version,
        "created_by": created.decode("utf-8", "replace") if created else None,
        "n_rows": n_rows,
        "n_row_groups": len(rg_rows),
        "column_names": names,
        "physical_types": types,
        "codecs": sorted(codecs),
        "encodings": sorted(encodings),
        "n_chunks": n_chunks,
        "num_values": num_values,
        "total_compressed": comp,
        "total_uncompressed": uncomp,
        "null_count": nulls if have_nulls else None,
        "null_stats": null_stats,
        "rg_rows": rg_rows,
        "int64_stats": int64_stats,
        "binary_stats": binary_stats,
        "bloom_offsets": bloom_offsets,
    }


def read_footer_tail(fetch, size: int, probe: int = 1 << 16) -> bytes:
    """Footer-only IO for the scale path: ``fetch(offset, length)``
    range-reads a file of ``size`` bytes; returns the smallest tail
    containing the whole footer (probe tail first, re-fetch exact when
    the footer is longer).  At 100 TB this is the difference between
    auditing a lake by reading tails and reading the lake."""
    if size < 12:
        raise ValueError("parquet file too short")
    tail = fetch(max(0, size - probe), min(probe, size))
    if tail[-4:] != _MAGIC:
        raise ValueError("not a parquet file (bad magic)")
    flen = struct.unpack("<I", tail[-8:-4])[0]
    need = flen + 8
    if need + 4 > size:
        raise ValueError("footer length out of bounds")
    if need > len(tail):
        tail = fetch(size - need, need)
    return tail[len(tail) - need :]


def parse_footer_tail(tail: bytes) -> dict:
    """Footer metadata from a :func:`read_footer_tail` slice (footer +
    length + magic, no leading file magic)."""
    return parse_parquet_footer(_MAGIC + tail)


# ---------------------------------------------------------------------------
# fixture writer + full reader (UNCOMPRESSED / PLAIN / required scope)
# ---------------------------------------------------------------------------

def _plain_pages(ids: list[int], names: list[bytes]) -> tuple[bytes, bytes]:
    d_id = b"".join(struct.pack("<q", i) for i in ids)
    d_nm = b"".join(struct.pack("<I", len(b)) + b for b in names)
    return d_id, d_nm


def _page(data: bytes, n: int) -> bytes:
    hdr = _tstruct([
        (1, _CT_I32, _PAGE_DATA),
        (2, _CT_I32, len(data)),
        (3, _CT_I32, len(data)),
        (5, _CT_STRUCT, _tstruct([
            (1, _CT_I32, n),
            (2, _CT_I32, 0),   # PLAIN
            (3, _CT_I32, 3),   # RLE def levels (none written: required)
            (4, _CT_I32, 3),   # RLE rep levels (none written: flat)
        ])),
    ])
    return hdr + data


def make_parquet(row_groups: list[list[tuple[int, str]]]) -> bytes:
    """A real minimal parquet file of ``(id int64, name utf8)`` rows —
    v1 data pages, PLAIN, UNCOMPRESSED, one page per chunk.  DuckDB and
    pyarrow read the output (interop-pinned in tests)."""
    out = bytearray(_MAGIC)
    rg_meta = []
    total_rows = 0
    for rows in row_groups:
        if not rows:
            raise ValueError("empty row group")
        ids = [r[0] for r in rows]
        names = [r[1].encode("utf-8") for r in rows]
        d_id, d_nm = _plain_pages(ids, names)
        chunks = []
        for col, data in (("id", d_id), ("name", d_nm)):
            off = len(out)
            page = _page(data, len(rows))
            out += page
            chunks.append((col, off, len(page)))
        cc = []
        for col, off, sz in chunks:
            fields = [
                (1, _CT_I32, _T_INT64 if col == "id" else _T_BYTE_ARRAY),
                (2, _CT_LIST, (_CT_I32, [0, 3])),  # PLAIN, RLE
                (3, _CT_LIST, (_CT_BINARY, [col])),
                (4, _CT_I32, 0),                   # UNCOMPRESSED
                (5, _CT_I64, len(rows)),
                (6, _CT_I64, sz),
                (7, _CT_I64, sz),
                (9, _CT_I64, off),
            ]
            if col == "id":
                # real Statistics: min_value/max_value (8-byte LE) — the
                # row-group skipping inputs every lake reader prunes by
                fields.append((12, _CT_STRUCT, _tstruct([
                    (3, _CT_I64, 0),
                    (5, _CT_BINARY, struct.pack("<q", max(ids))),
                    (6, _CT_BINARY, struct.pack("<q", min(ids))),
                ])))
            md = _tstruct(fields)
            cc.append(_tstruct([(2, _CT_I64, off), (3, _CT_STRUCT, md)]))
        rg_meta.append(_tstruct([
            (1, _CT_LIST, (_CT_STRUCT, cc)),
            (2, _CT_I64, sum(sz for _, _, sz in chunks)),
            (3, _CT_I64, len(rows)),
        ]))
        total_rows += len(rows)
    schema = [
        _tstruct([(4, _CT_BINARY, "schema"), (5, _CT_I32, 2)]),
        _tstruct([(1, _CT_I32, _T_INT64), (3, _CT_I32, 0),
                  (4, _CT_BINARY, "id")]),
        _tstruct([(1, _CT_I32, _T_BYTE_ARRAY), (3, _CT_I32, 0),
                  (4, _CT_BINARY, "name"), (6, _CT_I32, 0)]),  # UTF8
    ]
    # ColumnOrder TYPE_ORDER per leaf: readers (arrow) only trust
    # min_value/max_value statistics when the order is declared
    type_order = _tstruct([(1, _CT_STRUCT, _tstruct([]))])
    footer = _tstruct([
        (1, _CT_I32, 1),
        (2, _CT_LIST, (_CT_STRUCT, schema)),
        (3, _CT_I64, total_rows),
        (4, _CT_LIST, (_CT_STRUCT, rg_meta)),
        (6, _CT_BINARY, "hainan-spark parquetfmt"),
        (7, _CT_LIST, (_CT_STRUCT, [type_order, type_order])),
    ])
    out += footer
    out += struct.pack("<I", len(footer))
    out += _MAGIC
    return bytes(out)


def parse_parquet(payload: bytes) -> dict:
    """Full decode of an in-scope file: footer walk, then PLAIN page
    decode per chunk.  Out-of-scope codec/encoding/page kinds (real
    arrow files dictionary-encode) quarantine as ValueError.  Returns
    ``{n_row_groups, n_rows, sum_ids, n_names, name_bytes, data_bytes,
    rows}``."""
    meta = parse_parquet_footer(payload)
    if meta["column_names"] != ["id", "name"] or meta["physical_types"] != [
        "INT64",
        "BYTE_ARRAY",
    ]:
        raise ValueError("only (id int64, name utf8) schemas in scope")
    if meta["codecs"] != ["UNCOMPRESSED"]:
        raise ValueError("only UNCOMPRESSED pages in scope")
    if not set(meta["encodings"]) <= {"PLAIN", "RLE"}:
        raise ValueError("only PLAIN data pages in scope")
    flen = struct.unpack("<I", payload[-8:-4])[0]
    fstart = len(payload) - 8 - flen
    fmd, _ = _read_struct(payload[fstart : len(payload) - 8], 0, 0)
    rows: list[tuple[int, str]] = []
    data_bytes = 0
    for rg in _need_list(fmd.get(4), "row_groups"):
        rg = _need_struct(rg, "row group")
        nrows = _need_int(rg.get(3), "row group num_rows")
        cols: dict[str, list] = {}
        for ch in _need_list(rg.get(1), "row group columns"):
            md = _need_struct(_need_struct(ch, "chunk").get(3), "metadata")
            path = _need_list(md.get(3), "path_in_schema")
            if len(path) != 1 or not isinstance(path[0], bytes):
                raise ValueError("nested path_in_schema out of scope")
            name = path[0].decode()
            ptype = _need_int(md.get(1), "chunk type")
            nvals = _need_int(md.get(5), "num_values")
            off = _need_int(md.get(9), "data_page_offset")
            end = off + _need_int(md.get(7), "total_compressed_size")
            if not (4 <= off <= end <= fstart):
                raise ValueError("column chunk overruns the footer")
            vals: list = []
            pos = off
            while len(vals) < nvals:
                hdr, pos = _read_struct(payload, pos, 0)
                if _need_int(hdr.get(1), "page type") != _PAGE_DATA:
                    raise ValueError("only v1 data pages in scope")
                psz = _need_int(hdr.get(3), "compressed_page_size")
                dph = _need_struct(hdr.get(5), "data page header")
                pn = _need_int(dph.get(1), "page num_values")
                if _need_int(dph.get(2), "page encoding") != 0:
                    raise ValueError("only PLAIN data pages in scope")
                if pos + psz > end:
                    raise ValueError("page overruns its chunk")
                pdata = payload[pos : pos + psz]
                pos += psz
                data_bytes += psz
                vals.extend(_decode_plain(pdata, pn, ptype))
            if len(vals) != nvals or pos != end:
                raise ValueError("chunk pages disagree with num_values")
            cols[name] = vals
        if set(cols) != {"id", "name"}:
            raise ValueError("row group missing a column chunk")
        if len(cols["id"]) != nrows or len(cols["name"]) != nrows:
            raise ValueError("column length disagrees with row count")
        rows.extend(zip(cols["id"], cols["name"]))
    if len(rows) != meta["n_rows"]:
        raise ValueError("footer num_rows disagrees with pages")
    return {
        "n_row_groups": meta["n_row_groups"],
        "n_rows": len(rows),
        "sum_ids": sum(i for i, _ in rows),
        "n_names": len({n for _, n in rows}),
        "name_bytes": sum(len(n.encode()) for _, n in rows),
        "data_bytes": data_bytes,
        "rows": rows,
    }


def _decode_plain(
    data: bytes, n: int, ptype: int, type_length: int = 0
) -> list:
    if ptype == _T_INT96:
        # legacy Spark/Hive timestamps: 8-byte LE nanos-of-day then
        # 4-byte LE Julian day — decoded to EPOCH MICROS
        if len(data) < 12 * n:
            raise ValueError("PLAIN int96 page truncated")
        out96 = []
        for k in range(n):
            nanos = int.from_bytes(data[12 * k : 12 * k + 8], "little")
            jd = int.from_bytes(data[12 * k + 8 : 12 * k + 12], "little")
            out96.append(
                (jd - _JULIAN_EPOCH_DAY) * 86_400_000_000 + nanos // 1_000
            )
        return out96
    if ptype == _T_FLBA:
        # fixed-len byte array: DECIMAL's physical layout — big-endian
        # two's-complement unscaled integers of type_length bytes
        w = type_length
        if w <= 0:
            raise ValueError("FLBA leaf missing its type_length")
        if len(data) < w * n:
            raise ValueError("PLAIN fixed-len-byte-array page truncated")
        return [
            int.from_bytes(data[w * k : w * (k + 1)], "big", signed=True)
            for k in range(n)
        ]
    if ptype in _FIXED_WIDTH:
        w, f = _FIXED_WIDTH[ptype], _STRUCT_FMT[ptype]
        if len(data) != w * n:
            raise ValueError("PLAIN fixed-width page size mismatch")
        return list(struct.unpack(f"<{n}{f}", data))
    if ptype == _T_BYTE_ARRAY:
        out = []
        pos = 0
        for _ in range(n):
            if pos + 4 > len(data):
                raise ValueError("PLAIN byte_array length truncated")
            ln = struct.unpack("<I", data[pos : pos + 4])[0]
            pos += 4
            if pos + ln > len(data):
                raise ValueError("PLAIN byte_array value truncated")
            out.append(data[pos : pos + ln].decode("utf-8", "strict"))
            pos += ln
        if pos != len(data):
            raise ValueError("PLAIN byte_array page has trailing bytes")
        return out
    raise ValueError(f"PLAIN decode of type {ptype} out of scope")


# ---------------------------------------------------------------------------
# real data-page decode: snappy + RLE/bit-packed hybrid + dictionary
# ---------------------------------------------------------------------------

def hybrid_decode(
    buf: bytes, pos: int, bitwidth: int, count: int
) -> tuple[list[int], int]:
    """Parquet's RLE/bit-packed hybrid (Encodings.md): uvarint header,
    LSB 0 ⇒ an RLE run with a ceil(bw/8)-byte little-endian value,
    LSB 1 ⇒ (header>>1) groups of 8 values bit-packed LSB-first."""
    if bitwidth < 0 or bitwidth > 32:
        raise ValueError("hybrid bit width out of range")
    out: list[int] = []
    mask = (1 << bitwidth) - 1
    while len(out) < count:
        h, pos = read_varint(buf, pos)
        if h & 1:
            groups = h >> 1
            nbytes = groups * bitwidth
            if pos + nbytes > len(buf):
                raise ValueError("hybrid bit-packed group truncated")
            bits = int.from_bytes(buf[pos : pos + nbytes], "little")
            pos += nbytes
            take = min(groups * 8, count - len(out))
            out.extend(
                (bits >> (i * bitwidth)) & mask for i in range(take)
            )
        else:
            run = h >> 1
            if run > count - len(out):
                raise ValueError("hybrid RLE run overruns value count")
            nb = (bitwidth + 7) // 8
            if pos + nb > len(buf):
                raise ValueError("hybrid RLE value truncated")
            v = int.from_bytes(buf[pos : pos + nb], "little")
            pos += nb
            out.extend([v] * run)
    return out, pos


def _schema_leaf_map(
    fmd: dict,
) -> tuple[
    dict[str, tuple[int, int, int | None, int, tuple[int, ...]]],
    dict[str, tuple[int | None, int]],
]:
    """``(leaves, groups)`` from the flattened pre-order schema tree
    (num_children drives descent).  ``leaves``: dotted leaf path →
    ``(max_def_level, max_rep_level, ptype, type_length, rep_defs)``
    where ``rep_defs`` is the definition level AT each REPEATED
    ancestor in path order — the Dremel reassembly thresholds for
    list/map columns.  ``groups``: dotted group path →
    ``(converted_type, repetition_type, def_level, rep_level)`` so
    readers can recognize LIST (3) / MAP (1) / MAP_KEY_VALUE (2)
    annotations and tell a null struct ELEMENT (def below the group's
    level) from a present element with null fields.  OPTIONAL (1)
    bumps the definition level, REPEATED (2) bumps both — this is how
    struct leaves like Delta checkpoints' ``add.path`` acquire
    max_def_level 2 while staying rep-level 0."""
    els = _need_list(fmd.get(2), "schema")
    if not els:
        raise ValueError("empty parquet schema")
    out: dict[str, tuple[int, int, int | None, int, tuple[int, ...]]] = {}
    groups: dict[str, tuple[int | None, int, int, int]] = {}

    def walk(
        prefix: str, dl: int, rl: int, i: int, rep_defs: tuple[int, ...]
    ) -> int:
        if i >= len(els):
            raise ValueError("schema tree overruns the element list")
        el = _need_struct(els[i], "schema element")
        nm = el.get(4)
        name = nm.decode("utf-8", "replace") if isinstance(nm, bytes) else ""
        rep = el.get(3)
        rep = rep if isinstance(rep, int) else 0
        if rep == 1:
            dl += 1
        elif rep == 2:
            dl += 1
            rl += 1
            rep_defs = rep_defs + (dl,)
        path = f"{prefix}.{name}" if prefix else name
        nchild = el.get(5)
        if isinstance(nchild, int) and nchild > 0:
            conv = el.get(6)
            groups[path] = (
                conv if isinstance(conv, int) else None, rep, dl, rl
            )
            j = i + 1
            for _ in range(nchild):
                j = walk(path, dl, rl, j, rep_defs)
            return j
        t = el.get(1)
        tl = el.get(2)
        out[path] = (
            dl, rl,
            t if isinstance(t, int) else None,
            tl if isinstance(tl, int) else 0,
            rep_defs,
        )
        return i + 1

    root = _need_struct(els[0], "schema root")
    n = _need_int(root.get(5), "root num_children")
    i = 1
    for _ in range(n):
        i = walk("", 0, 0, i, ())
    return out, groups


def _read_leaf_column(
    payload: bytes,
    rg_index: int,
    column: str,
    expect_type: int | None,
    fname: str,
    with_nulls: bool = False,
    ctx: dict | None = None,
    with_levels: bool = False,
) -> dict:
    """Decode ONE real leaf column chunk end-to-end — UNCOMPRESSED or
    SNAPPY pages, PLAIN or dictionary encoding (PLAIN dictionary page +
    RLE_DICTIONARY indices), v1 data pages with hybrid definition
    levels.  ``column`` is the DOTTED leaf path (``add.path`` for a
    struct member — the layout Delta checkpoint files use); top-level
    columns are the single-segment case.  Definition levels are decoded
    at the schema-derived bit width (max_def_level may exceed 1 for
    struct leaves); a value is present iff its level equals
    max_def_level.  Repeated fields (lists/maps, max_rep_level > 0)
    require ``with_levels=True`` — the result then carries entry-aligned
    ``dls``/``rls`` lists for Dremel reassembly (see
    :func:`read_list_column` / :func:`read_map_column`); without it
    they raise, preserving the scalar contract.  ``with_nulls=True``
    returns values aligned to entry positions with ``None`` holes —
    required to zip sibling struct leaves back into rows.  ``ctx``
    (from :func:`footer_ctx`) reuses one footer parse across many
    column/row-group reads."""
    if ctx is None:
        ctx = footer_ctx(payload)
    fmd, fstart = ctx["fmd"], ctx["fstart"]
    rgs = ctx["rgs"]
    if not 0 <= rg_index < len(rgs):
        raise ValueError("row group index out of range")
    md = None
    for ch in _need_list(_need_struct(rgs[rg_index], "rg").get(1), "cols"):
        m = _need_struct(_need_struct(ch, "chunk").get(3), "metadata")
        path = m.get(3)
        if (
            isinstance(path, list)
            and all(isinstance(seg, bytes) for seg in path)
            and ".".join(seg.decode("utf-8", "replace") for seg in path)
            == column
        ):
            md = m
            break
    if md is None:
        raise ValueError(f"column {column!r} not in row group")
    ctype = _need_int(md.get(1), "type")
    if expect_type is not None and ctype != expect_type:
        raise ValueError(
            f"{fname} on a non-"
            + ("INT64" if expect_type == _T_INT64 else "BYTE_ARRAY")
            + " chunk"
        )
    if ctype not in (_T_BOOLEAN, _T_INT32, _T_INT64, _T_INT96,
                     _T_FLOAT, _T_DOUBLE, _T_BYTE_ARRAY, _T_FLBA):
        raise ValueError(f"leaf type {ctype} out of decode scope")
    codec = _need_int(md.get(4), "codec")
    # UNCOMPRESSED / SNAPPY / GZIP / ZSTD / LZ4_RAW (5 = deprecated
    # Hadoop-framed LZ4, 3/4 = LZO/Brotli: still loud quarantines)
    if codec not in (0, 1, 2, 6, 7):
        raise ValueError(f"codec {_CODECS.get(codec, codec)} out of scope")
    nvals = _need_int(md.get(5), "num_values")
    dict_off = md.get(11)
    start = dict_off if isinstance(dict_off, int) else _need_int(
        md.get(9), "data_page_offset"
    )
    end = start + _need_int(md.get(7), "total_compressed_size")
    if not (4 <= start <= end <= fstart):
        raise ValueError("column chunk overruns the footer")
    leaves = ctx["leaves"]
    if column not in leaves:
        raise ValueError(f"column {column!r} not in schema")
    max_def, max_rep, _, type_length = leaves[column][:4]
    if max_rep > 0 and not with_levels:
        raise ValueError(
            "repeated fields (lists/maps) need with_levels=True "
            "(read_list_column / read_map_column assemble rows)"
        )
    dl_bits = max_def.bit_length()
    rl_bits = max_rep.bit_length()
    dictionary: list | None = None
    values: list = []
    dls_all: list[int] = []
    rls_all: list[int] = []
    n_nulls = 0
    pos = start
    n_seen = 0
    while pos < end and n_seen < nvals:
        hdr, p2 = _read_struct(payload, pos, 0)
        ptype = _need_int(hdr.get(1), "page type")
        usz = _need_int(hdr.get(2), "uncompressed_page_size")
        csz = _need_int(hdr.get(3), "compressed_page_size")
        if p2 + csz > end:
            raise ValueError("page overruns its chunk")
        raw = payload[p2 : p2 + csz]
        if ptype == _PAGE_DICT:
            body = _decompress_page(raw, codec, usz)
            nd = _need_int(
                _need_struct(hdr.get(7), "dictionary page header").get(1),
                "dictionary size",
            )
            dictionary = _decode_plain(body, nd, ctype, type_length)
        elif ptype == _PAGE_DATA:
            body = _decompress_page(raw, codec, usz)
            dph = _need_struct(hdr.get(5), "data page header")
            pn = _need_int(dph.get(1), "page num_values")
            enc = _need_int(dph.get(2), "page encoding")
            q = 0
            if max_rep == 0:
                rls = [0] * pn
            else:  # v1 layout: rep level section FIRST (4-byte length)
                if q + 4 > len(body):
                    raise ValueError("repetition level length truncated")
                rl_len = int.from_bytes(body[q : q + 4], "little")
                q += 4
                if q + rl_len > len(body):
                    raise ValueError("repetition levels truncated")
                rls, _ = hybrid_decode(body[q : q + rl_len], 0, rl_bits, pn)
                q += rl_len
            if max_def == 0:  # REQUIRED all the way down: no level section
                dls = [max_def] * pn
            else:
                if q + 4 > len(body):
                    raise ValueError("definition level length truncated")
                dl_len = int.from_bytes(body[q : q + 4], "little")
                q += 4
                if q + dl_len > len(body):
                    raise ValueError("definition levels truncated")
                dls, _ = hybrid_decode(body[q : q + dl_len], 0, dl_bits, pn)
                q += dl_len
            nnz = sum(1 for d in dls if d == max_def)
            n_nulls += pn - nnz
            page_vals = _decode_page_values(
                body[q:], enc, nnz, ctype, dictionary, type_length
            )
            values.extend(
                _interleave(page_vals, dls, max_def)
                if with_nulls or with_levels
                else page_vals
            )
            if with_levels:
                dls_all.extend(dls)
                rls_all.extend(rls)
            n_seen += pn
        elif ptype == _PAGE_DATA_V2:
            # v2 layout: rep + def level runs UNCOMPRESSED at the front
            # (no 4-byte prefixes — lengths live in the header), the
            # values section alone compressed when is_compressed.
            dph = _need_struct(hdr.get(8), "data page v2 header")
            pn = _need_int(dph.get(1), "page num_values")
            enc = _need_int(dph.get(4), "page encoding")
            dl_len = _need_int(dph.get(5), "def level byte length")
            rl_len = _need_int(dph.get(6), "rep level byte length")
            is_compressed = dph.get(7)
            if is_compressed is None:
                is_compressed = True
            if rl_len + dl_len > len(raw):
                raise ValueError("v2 level sections overrun the page")
            if max_rep == 0:
                if rl_len:
                    raise ValueError("v2 rep levels on a non-repeated column")
                rls = [0] * pn
            else:  # v2: rep level run first, NO 4-byte length prefix
                rls, _ = hybrid_decode(raw[:rl_len], 0, rl_bits, pn)
            if max_def == 0:
                if dl_len:
                    raise ValueError("v2 def levels on a REQUIRED column")
                dls = [0] * pn
            else:
                dls, _ = hybrid_decode(
                    raw[rl_len : rl_len + dl_len], 0, dl_bits, pn
                )
            vals_part = raw[rl_len + dl_len :]
            if is_compressed:
                vals_part = _decompress_page(
                    vals_part, codec, usz - rl_len - dl_len
                )
            elif len(vals_part) != usz - rl_len - dl_len:
                raise ValueError("v2 page size disagrees with header")
            nnz = sum(1 for d in dls if d == max_def)
            n_nulls += pn - nnz
            page_vals = _decode_page_values(
                vals_part, enc, nnz, ctype, dictionary, type_length
            )
            values.extend(
                _interleave(page_vals, dls, max_def)
                if with_nulls or with_levels
                else page_vals
            )
            if with_levels:
                dls_all.extend(dls)
                rls_all.extend(rls)
            n_seen += pn
        else:
            raise ValueError("only data/dictionary pages in scope")
        pos = p2 + csz
    if n_seen != nvals:
        raise ValueError("chunk pages disagree with num_values")
    out = {
        "n_values": n_seen - n_nulls,
        "n_nulls": n_nulls,
        "values": values,
    }
    if with_levels:
        out["dls"] = dls_all
        out["rls"] = rls_all
    return out


def read_int64_column(payload: bytes, rg_index: int, column: str) -> dict:
    """INT64 leaf chunk (top-level or dotted struct path) — see
    :func:`_read_leaf_column`.  Returns ``{n_values, n_nulls, values}``
    with nulls elided (the original round-7 contract)."""
    return _read_leaf_column(payload, rg_index, column, _T_INT64,
                             "read_int64_column")


def read_string_column(payload: bytes, rg_index: int, column: str) -> dict:
    """BYTE_ARRAY twin of :func:`read_int64_column` (UTF-8 strings)."""
    return _read_leaf_column(payload, rg_index, column, _T_BYTE_ARRAY,
                             "read_string_column")


# ---------------------------------------------------------------------------
# repeated (list/map) leaves — Dremel record reassembly
# (parquet-format LogicalTypes.md "Lists"/"Maps"; Melnik et al. 2010 §4)
# ---------------------------------------------------------------------------

# ConvertedType ids (parquet.thrift): MAP=1, MAP_KEY_VALUE=2, LIST=3
_CONV_MAP, _CONV_MAP_KV, _CONV_LIST = 1, 2, 3


def _assemble_nested(
    values: list,
    dls: list[int],
    rls: list[int],
    max_def: int,
    rep_defs: tuple[int, ...],
    raw: bool = False,
) -> list:
    """Arbitrary-depth Dremel reassembly (Melnik et al. 2010 §4):
    ``rep_defs[k-1]`` is the definition level AT the k-th repeated
    ancestor.  A row starts at ``r == 0``; an entry with ``r == k``
    starts a new element of the level-k list; deeper ``r`` continues a
    nested list inside the current element.  Per level k the first
    entry's def level decides: ``d < rep_defs[k-1]-1`` → null list,
    ``== rep_defs[k-1]-1`` → empty, else elements."""
    R = len(rep_defs)

    def build(entries: list, k: int):
        d0 = entries[0][1]
        if d0 < rep_defs[k - 1] - 1:
            return None
        if d0 == rep_defs[k - 1] - 1:
            if len(entries) != 1:
                raise ValueError(
                    "repetition level continues a null/empty list"
                )
            return []
        items: list[list] = []
        for e in entries:
            if not items or e[2] == k:
                items.append([e])
            else:
                items[-1].append(e)
        out = []
        for item in items:
            if k == R:
                if len(item) != 1:
                    raise ValueError(
                        "repetition level deeper than the schema"
                    )
                v, d, _ = item[0]
                if raw:
                    out.append((v, d))
                else:
                    out.append(v if d == max_def else None)
            else:
                out.append(build(item, k + 1))
        return out

    rows: list = []
    cur: list = []
    for triple in zip(values, dls, rls):
        if triple[2] == 0 and cur:
            rows.append(build(cur, 1))
            cur = []
        elif triple[2] != 0 and not cur:
            raise ValueError("repetition level continues a null/empty list")
        cur.append(triple)
    if cur:
        rows.append(build(cur, 1))
    return rows


def _logical_root(ctx: dict, leaf: str) -> tuple[str, str]:
    """``(root_path, kind)`` for a repeated leaf: the OUTERMOST
    LIST/MAP-annotated ancestor group (kind ``list``/``map`` — the
    logical column; nested lists keep the top name), or the leaf
    itself for a legacy bare ``repeated`` primitive field (kind
    ``list``)."""
    groups = ctx["groups"]
    segs = leaf.split(".")
    for k in range(1, len(segs)):
        path = ".".join(segs[:k])
        conv = groups.get(path, (None, 0, 0, 0))[0]
        if conv == _CONV_LIST:
            return path, "list"
        if conv == _CONV_MAP or conv == _CONV_MAP_KV:
            # MAP annotates the outer group; legacy MAP_KEY_VALUE may
            # annotate the repeated key_value group itself — the outer
            # name is the logical column either way
            root = ".".join(segs[: k - 1]) if conv == _CONV_MAP_KV else path
            if conv == _CONV_MAP_KV and not root:
                root = path  # key_value at top level (degenerate)
            return root, "map"
    return leaf, "list"  # bare repeated primitive


def _repeated_leaves_under(ctx: dict, root: str) -> list[str]:
    pref = root + "."
    return sorted(
        n for n, meta in ctx["leaves"].items()
        if meta[1] >= 1 and (n == root or n.startswith(pref))
    )


def _read_assembled(
    payload: bytes, rg_index: int, leaf: str, ctx: dict,
    max_rep_allowed: int | None = None,
) -> list[list | None]:
    meta = ctx["leaves"][leaf]
    max_def, max_rep, _ptype, _tl, rep_defs = meta
    if max_rep < 1 or len(rep_defs) != max_rep:
        raise ValueError(f"leaf {leaf!r} is not repeated")
    if max_rep_allowed is not None and max_rep > max_rep_allowed:
        raise ValueError(
            f"leaf {leaf!r} nests {max_rep} repetition levels; "
            f"only {max_rep_allowed} supported here"
        )
    got = _read_leaf_column(
        payload, rg_index, leaf, None, "read_list_column",
        ctx=ctx, with_levels=True,
    )
    return _assemble_nested(
        got["values"], got["dls"], got["rls"], max_def, rep_defs
    )


def read_list_column(
    payload: bytes, rg_index: int, column: str, ctx: dict | None = None
) -> list[list | None]:
    """Per-row values of an ``array<…>`` column (standard 3-level LIST
    layout, nested to ANY depth — ``array<array<…>>`` rebuilds as
    nested Python lists, ``array<struct<…>>`` as lists of dicts — or a
    legacy bare repeated primitive): row →
    list of element values (``None`` holes for null elements),
    ``None`` for a null list, ``[]`` for an empty one."""
    if ctx is None:
        ctx = footer_ctx(payload)
    leaves = _repeated_leaves_under(ctx, column)
    if column in ctx["leaves"] and ctx["leaves"][column][1] == 1:
        leaves = [column]  # bare repeated primitive leaf
    if len(leaves) == 1:
        return _read_assembled(payload, rg_index, leaves[0], ctx)
    if not leaves:
        raise ValueError(
            f"column {column!r} has no repeated leaves"
        )
    return _read_struct_list(payload, rg_index, column, leaves, ctx)


def _read_struct_list(
    payload: bytes, rg_index: int, column: str, leaves: list[str],
    ctx: dict,
) -> list[list | None]:
    """``array<struct<…>>``: every field leaf shares the list's
    repetition structure, so each assembles independently and the
    elements zip into dicts.  A null ELEMENT (def level below the
    element group's) is distinguished from a present element whose
    fields are all null — the distinction lives in the def levels, not
    the values (Dremel §4.2)."""
    groups = ctx["groups"]
    rep_group = None
    for g, meta in groups.items():
        if (
            meta[1] == 2
            and g.startswith(column + ".")
            and "." not in g[len(column) + 1 :]
        ):
            rep_group = g
    if rep_group is None:
        raise ValueError(
            f"column {column!r} has no repeated child group"
        )
    elems = set()
    for lf in leaves:
        if not lf.startswith(rep_group + "."):
            raise ValueError(
                f"leaf {lf!r} outside the repeated group {rep_group!r}"
            )
        rest = lf[len(rep_group) + 1 :]
        if "." not in rest:
            raise ValueError(
                f"column {column!r} mixes scalar and struct elements"
            )
        elems.add(rest.split(".", 1)[0])
    if len(elems) != 1:
        raise ValueError(
            f"column {column!r} does not have a single element group"
        )
    elem_prefix = f"{rep_group}.{elems.pop()}"
    dl_elem = groups[elem_prefix][2]
    field_rows: dict[str, list] = {}
    for lf in leaves:
        meta = ctx["leaves"][lf]
        if meta[1] != 1:
            raise ValueError(
                "list<struct> fields with their own repetition "
                "(nested lists/maps inside the struct) out of scope"
            )
        got = _read_leaf_column(
            payload, rg_index, lf, None, "read_list_column",
            ctx=ctx, with_levels=True,
        )
        field_rows[lf[len(elem_prefix) + 1 :]] = _assemble_nested(
            got["values"], got["dls"], got["rls"], meta[0], meta[4],
            raw=True,
        )
    names = sorted(field_rows)
    base = field_rows[names[0]]
    for f in names[1:]:
        other = field_rows[f]
        if len(other) != len(base) or any(
            (a is None) != (b is None)
            or (a is not None and len(a) != len(b))
            for a, b in zip(base, other)
        ):
            raise ValueError(
                "list<struct> field leaves disagree on list shape"
            )
    out: list[list | None] = []
    for r, row in enumerate(base):
        if row is None:
            out.append(None)
            continue
        elems_out = []
        for i, (_, d0) in enumerate(row):
            if d0 < dl_elem:
                elems_out.append(None)  # the struct element is null
            else:
                elems_out.append(
                    {f: field_rows[f][r][i][0] for f in names}
                )
        out.append(elems_out)
    return out


def read_map_column(
    payload: bytes, rg_index: int, column: str, ctx: dict | None = None
) -> list[dict | None]:
    """Per-row entries of a ``map<…,…>`` column (standard LIST-shaped
    MAP layout): row → dict (``None`` for a null map, ``{}`` for an
    empty one).  Duplicate keys within one row are quarantined — the
    spec leaves their semantics to the writer and a silent last-wins
    would mask corruption."""
    if ctx is None:
        ctx = footer_ctx(payload)
    leaves = _repeated_leaves_under(ctx, column)
    key_leaf = [n for n in leaves if n.rsplit(".", 1)[-1] == "key"]
    val_leaf = [n for n in leaves if n.rsplit(".", 1)[-1] == "value"]
    if len(key_leaf) != 1 or len(val_leaf) != 1:
        raise ValueError(
            f"column {column!r} does not resolve to map key/value leaves"
        )
    # maps nested inside lists (or with list/map values) stay out of
    # scope: key/value leaves must sit at exactly one repetition level
    keys = _read_assembled(
        payload, rg_index, key_leaf[0], ctx, max_rep_allowed=1
    )
    vals = _read_assembled(
        payload, rg_index, val_leaf[0], ctx, max_rep_allowed=1
    )
    if len(keys) != len(vals):
        raise ValueError("map key/value leaves disagree on row count")
    out: list[dict | None] = []
    for ks, vs in zip(keys, vals):
        if (ks is None) != (vs is None):
            raise ValueError("map key/value leaves disagree on null rows")
        if ks is None:
            out.append(None)
            continue
        if len(ks) != len(vs):
            raise ValueError("map key/value leaves disagree on entry count")
        if any(k is None for k in ks):
            raise ValueError("map with a null key")
        d = dict(zip(ks, vs))
        if len(d) != len(ks):
            raise ValueError("map with duplicate keys")
        out.append(d)
    return out


def read_leaf_column(
    payload: bytes, rg_index: int, column: str, with_nulls: bool = False
) -> dict:
    """Type-inferred leaf read; ``with_nulls=True`` keeps row alignment
    (None holes) so sibling struct leaves zip back into rows — the
    Delta-checkpoint consumption shape (operators/deltalog.py)."""
    return _read_leaf_column(payload, rg_index, column, None,
                             "read_leaf_column", with_nulls=with_nulls)


def footer_ctx(payload: bytes) -> dict:
    """Parse a file's footer + schema leaf map ONCE for reuse across
    per-column reads (``read_leaf_columns``): the per-call footer
    re-parse is O(cols × row_groups × footer size) on wide files."""
    if payload[:4] != _MAGIC or payload[-4:] != _MAGIC:
        raise ValueError("not a parquet file (bad magic)")
    flen = struct.unpack("<I", payload[-8:-4])[0]
    fstart = len(payload) - 8 - flen
    if fstart < 4:
        raise ValueError("footer length out of bounds")
    fmd, _ = _read_struct(payload[fstart : len(payload) - 8], 0, 0)
    leaves, groups = _schema_leaf_map(fmd)
    return {
        "fmd": fmd,
        "fstart": fstart,
        "rgs": _need_list(fmd.get(4), "row_groups"),
        "leaves": leaves,
        "groups": groups,
    }


def read_leaf_columns(
    payload: bytes,
    rg_index: int,
    columns: list[str],
    with_nulls: bool = False,
    ctx: dict | None = None,
) -> dict[str, dict]:
    """Several leaves of one row group with a single footer parse."""
    if ctx is None:
        ctx = footer_ctx(payload)
    return {
        c: _read_leaf_column(payload, rg_index, c, None,
                             "read_leaf_columns", with_nulls=with_nulls,
                             ctx=ctx)
        for c in columns
    }


# ---------------------------------------------------------------------------
# DELTA_* encodings (parquet-format Encodings.md) — the layouts modern
# writers emit for sorted ids (DELTA_BINARY_PACKED) and string columns
# (DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY, arrow's v2 defaults)
# ---------------------------------------------------------------------------

def _decompress_page(raw: bytes, codec: int, usz: int) -> bytes:
    """Decompress one page section per the chunk codec and verify the
    header-declared uncompressed size."""
    if codec == 0:
        body = raw
    elif codec == 1:
        from .snappy import snappy_decompress

        body = snappy_decompress(raw)
    elif codec == 6:
        from .zstd import zstd_decompress

        body = zstd_decompress(raw)
    elif codec == 2:  # GZIP: each page is one full gzip member
        import zlib

        try:
            body = zlib.decompress(raw, 16 + 15)
        except zlib.error as e:
            raise ValueError(f"gzip page: {e}") from e
    elif codec == 7:  # LZ4_RAW: one lz4 block per page, no framing
        from .lz4 import lz4_block_decompress

        body = lz4_block_decompress(raw)
    else:
        raise ValueError(f"codec {_CODECS.get(codec, codec)} out of scope")
    if len(body) != usz:
        raise ValueError("page size disagrees with header")
    return body


def _decode_page_values(
    body: bytes,
    enc: int,
    nnz: int,
    ctype: int,
    dictionary: list | None,
    type_length: int = 0,
) -> list:
    """The non-null values of one data page, any in-scope encoding."""
    if enc in (8, 2):  # RLE_DICTIONARY / PLAIN_DICTIONARY
        if dictionary is None:
            raise ValueError("dictionary-encoded page before dict")
        if not body:
            raise ValueError("dictionary index width truncated")
        bw = body[0]
        idxs, _ = hybrid_decode(body, 1, bw, nnz)
        try:
            return [dictionary[i] for i in idxs]
        except IndexError:
            raise ValueError("dictionary index out of range")
    if enc == 0:  # PLAIN
        if ctype in (_T_INT96, _T_FLBA):
            return _decode_plain(body, nnz, ctype, type_length)
        if ctype == _T_BOOLEAN:  # bit-packed LSB-first
            # exact-consumption gate, mirroring _decode_plain: trailing
            # bytes mask page-size or level-count bugs (ADVICE r8)
            if (nnz + 7) // 8 != len(body):
                raise ValueError(
                    "PLAIN boolean page size disagrees with value count"
                )
            return [
                bool((body[i >> 3] >> (i & 7)) & 1) for i in range(nnz)
            ]
        if ctype in _FIXED_WIDTH:
            w, f = _FIXED_WIDTH[ctype], _STRUCT_FMT[ctype]
            if w * nnz != len(body):
                raise ValueError(
                    "PLAIN fixed-width page size disagrees with value count"
                )
            return list(struct.unpack(f"<{nnz}{f}", body[: w * nnz]))
        return _decode_plain(body, nnz, ctype)
    if enc == 5:  # DELTA_BINARY_PACKED
        if ctype not in (_T_INT32, _T_INT64):
            raise ValueError("DELTA_BINARY_PACKED on a non-integer chunk")
        vals, _ = delta_binary_unpack(body, 0)
        if len(vals) != nnz:
            raise ValueError("delta-binary count disagrees with page")
        return vals
    if enc == 3:  # RLE: v2 boolean pages (4-byte length + hybrid runs)
        if ctype != _T_BOOLEAN:
            raise ValueError("RLE value encoding on a non-boolean chunk")
        if len(body) < 4:
            raise ValueError("RLE boolean page truncated")
        bits, _ = hybrid_decode(body, 4, 1, nnz)
        return [bool(b) for b in bits]
    if enc == 9:  # BYTE_STREAM_SPLIT (float/double columns)
        if ctype not in (_T_FLOAT, _T_DOUBLE):
            raise ValueError("BYTE_STREAM_SPLIT on a non-float chunk")
        w, f = _FIXED_WIDTH[ctype], _STRUCT_FMT[ctype]
        if len(body) != w * nnz:
            raise ValueError("byte-stream-split page size mismatch")
        # k-th stream holds byte k of every value; re-interleave
        joined = bytes(
            body[k * nnz + i] for i in range(nnz) for k in range(w)
        )
        return list(struct.unpack(f"<{nnz}{f}", joined))
    if enc == 6:  # DELTA_LENGTH_BYTE_ARRAY
        if ctype != _T_BYTE_ARRAY:
            raise ValueError("DELTA_LENGTH_BYTE_ARRAY on a non-string chunk")
        return delta_length_byte_array(body, nnz)
    if enc == 7:  # DELTA_BYTE_ARRAY
        if ctype != _T_BYTE_ARRAY:
            raise ValueError("DELTA_BYTE_ARRAY on a non-string chunk")
        return delta_byte_array(body, nnz)
    raise ValueError(f"encoding {_ENCODINGS.get(enc, enc)} out of scope")


def _interleave(page_vals: list, dls: list[int], max_def: int) -> list:
    it = iter(page_vals)
    return [next(it) if d == max_def else None for d in dls]


def _wrap64(v: int) -> int:
    """Signed-int64 wrapping (the mod-2^64 arithmetic Encodings.md
    specifies for DELTA_BINARY_PACKED accumulation)."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def delta_binary_unpack(buf: bytes, pos: int) -> tuple[list[int], int]:
    """DELTA_BINARY_PACKED: ``<block size> <miniblocks per block>
    <total count> <first value zigzag>`` then per block ``<min delta
    zigzag> <bitwidth byte per miniblock> <bit-packed deltas>``.
    Values per miniblock = block/miniblocks; the last block keeps its
    full width list but only writes miniblocks that hold values."""
    block, pos = read_varint(buf, pos)
    nmini, pos = read_varint(buf, pos)
    total, pos = read_varint(buf, pos)
    zz, pos = read_varint(buf, pos)
    first = _wrap64(zigzag_decode(zz))
    if block <= 0 or nmini <= 0 or block % nmini != 0:
        raise ValueError("delta-binary block geometry invalid")
    if block > 1 << 20:  # writers use 128..4096; cap crafted headers
        raise ValueError("delta-binary block size implausible")
    per_mini = block // nmini
    if per_mini % 8 != 0:
        raise ValueError("delta-binary miniblock not a multiple of 8")
    if total > 1 << 27:  # allocation guard for crafted counts
        raise ValueError("delta-binary total count implausible")
    out = [first]
    while len(out) < total:
        zz, pos = read_varint(buf, pos)
        min_delta = zigzag_decode(zz)
        if pos + nmini > len(buf):
            raise ValueError("delta-binary width list truncated")
        widths = buf[pos : pos + nmini]
        pos += nmini
        for w in widths:
            if len(out) >= total:
                break  # trailing miniblocks with no values are absent
            if w > 64:
                raise ValueError("delta-binary bit width out of range")
            nbytes = w * per_mini // 8
            if pos + nbytes > len(buf):
                raise ValueError("delta-binary miniblock truncated")
            if w == 0:
                deltas = [0] * per_mini
            else:
                bits = int.from_bytes(buf[pos : pos + nbytes], "little")
                mask = (1 << w) - 1
                deltas = [(bits >> (i * w)) & mask for i in range(per_mini)]
            pos += nbytes
            prev = out[-1]
            for d in deltas:
                if len(out) >= total:
                    break
                # Encodings.md defines the accumulation mod 2^64 —
                # int64 extremes must wrap, not escape the domain
                prev = _wrap64(prev + min_delta + d)
                out.append(prev)
    return out[:total], pos


def delta_length_byte_array(buf: bytes, nnz: int) -> list[str]:
    """DELTA_LENGTH_BYTE_ARRAY: one DELTA_BINARY_PACKED run of lengths,
    then the concatenated bytes."""
    lens, pos = delta_binary_unpack(buf, 0)
    if len(lens) != nnz:
        raise ValueError("delta-length count disagrees with page")
    out = []
    for ln in lens:
        if ln < 0 or pos + ln > len(buf):
            raise ValueError("delta-length string truncated")
        out.append(buf[pos : pos + ln].decode("utf-8", "strict"))
        pos += ln
    return out


def delta_byte_array(buf: bytes, nnz: int) -> list[str]:
    """DELTA_BYTE_ARRAY (incremental/front coding): shared-prefix
    lengths and suffix lengths as two DELTA_BINARY_PACKED runs, then
    the suffix bytes."""
    prefixes, pos = delta_binary_unpack(buf, 0)
    suffixes, pos = delta_binary_unpack(buf, pos)
    if len(prefixes) != nnz or len(suffixes) != nnz:
        raise ValueError("delta-byte-array counts disagree with page")
    out: list[str] = []
    prev = b""
    for pl, sl in zip(prefixes, suffixes):
        if pl < 0 or sl < 0 or pl > len(prev) or pos + sl > len(buf):
            raise ValueError("delta-byte-array prefix/suffix invalid")
        cur = prev[:pl] + buf[pos : pos + sl]
        pos += sl
        out.append(cur.decode("utf-8", "strict"))
        prev = cur
    return out


def hand_read_table(payload: bytes) -> dict[str, list]:
    """Read EVERY leaf column of EVERY row group by hand — the audit
    capstone: column name → null-aligned values across the whole file,
    any supported codec/page-version/encoding/physical type (INT96 as
    epoch micros, FLBA as unscaled integers).  Repeated leaves assemble
    into per-row values under the logical column name: LIST columns
    (nested to any depth) and bare repeated primitives become (nested)
    lists (structs inside them become per-element dicts), MAP columns
    become dicts; maps under repetition stay loud quarantines.  One
    footer parse total."""
    ctx = footer_ctx(payload)
    scalars = [
        name for name, meta in ctx["leaves"].items() if meta[1] == 0
    ]
    rep1 = [name for name, meta in ctx["leaves"].items() if meta[1] >= 1]
    if not scalars and not rep1:
        raise ValueError("no leaf columns to read")
    roots: dict[str, str] = {}  # logical column → kind
    for leaf in rep1:
        root, kind = _logical_root(ctx, leaf)
        if roots.setdefault(root, kind) != kind:
            raise ValueError(f"column {root!r} mixes list and map leaves")
    out: dict[str, list] = {name: [] for name in scalars}
    for name in roots:
        out[name] = []
    for rg in range(len(ctx["rgs"])):
        if scalars:
            got = read_leaf_columns(
                payload, rg, scalars, with_nulls=True, ctx=ctx
            )
            for name in scalars:
                out[name].extend(got[name]["values"])
        for name, kind in roots.items():
            rows = (
                read_map_column(payload, rg, name, ctx=ctx)
                if kind == "map"
                else read_list_column(payload, rg, name, ctx=ctx)
            )
            out[name].extend(rows)
    return out
