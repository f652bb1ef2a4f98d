"""ORC-lite reader — the remaining big-data columnar container.

Apache ORC files are read tail-first: the LAST byte is the postscript
length; the postscript (a protobuf message — decoded here with the
same wire-format walk as operators/pbwire.py) gives the footer length
and compression; the footer lists stripe locations, the type tree and
row counts; each stripe ends with its own footer describing per-column
streams.  Column data in scope uses ORC's Run-Length Encoding v1:

- header byte ``0..127`` → a RUN of ``header+3`` values: one signed
  delta byte then the base as a varint (zigzag for signed columns);
- header byte ``-1..-128`` (two's complement) → ``-header`` LITERAL
  varints.

Scope (the honest mini-ORC): NONE compression, DIRECT RLEv1 encodings,
a ``struct<id:bigint, name:string>`` schema, no nulls (so no PRESENT
streams).  Everything else — unknown compression kinds, encodings,
type kinds — quarantines loudly; the structural walk (tail-first
postscript, protobuf footers, stripe stream resolution, RLEv1) is the
real thing, verified byte-for-byte by the fixture writer round-trip
and the DuckDB oracle.  Public knowledge: the Apache ORC v1
specification (orc.apache.org/specification/ORCv1).
"""

from __future__ import annotations

from .pbwire import read_varint, write_varint, zigzag_decode, zigzag_encode

_MAGIC = b"ORC"
_KIND_STRUCT, _KIND_LONG, _KIND_STRING = 12, 4, 7
_STREAM_DATA, _STREAM_LENGTH = 1, 2


# ---------------------------------------------------------------------------
# minimal protobuf message codec (field -> python) on top of pbwire
# ---------------------------------------------------------------------------

def _emit(num: int, wtype: int) -> bytes:
    return write_varint((num << 3) | wtype)


def _msg(fields: list[tuple[int, object]]) -> bytes:
    out = bytearray()
    for num, val in fields:
        if isinstance(val, int):
            out += _emit(num, 0) + write_varint(val)
        elif isinstance(val, (bytes, str)):
            raw = val.encode() if isinstance(val, str) else val
            out += _emit(num, 2) + write_varint(len(raw)) + raw
        else:
            raise ValueError(f"unsupported footer field {val!r}")
    return bytes(out)


def _decode_msg(buf: bytes) -> dict[int, list]:
    """Generic wire decode: field number -> list of values (varints as
    ints, length-delimited as bytes).  Unknown wire types reject."""
    pos = 0
    out: dict[int, list] = {}
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        num, wtype = tag >> 3, tag & 7
        if wtype == 0:
            v, pos = read_varint(buf, pos)
        elif wtype == 2:
            ln, pos = read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError(f"footer field {num} truncated")
            v = buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unexpected wire type {wtype} in footer")
        out.setdefault(num, []).append(v)
    return out


# ---------------------------------------------------------------------------
# RLEv1 long runs
# ---------------------------------------------------------------------------

def rle_v1_encode(values: list[int], signed: bool) -> bytes:
    """Spec-shaped RLEv1: constant-delta runs of >=3 encode as runs,
    everything else as literal groups (max 128)."""
    out = bytearray()
    i = 0
    n = len(values)
    while i < n:
        j = i + 1
        if j < n:
            delta = values[j] - values[i]
            if -128 <= delta <= 127:
                while (
                    j + 1 < n
                    and values[j + 1] - values[j] == delta
                    and j + 1 - i < 127 + 3 - 1
                ):
                    j += 1
        run = j - i + 1 if j < n else 1
        if j < n and run >= 3:
            out.append(run - 3)
            out.append(values[i + 1] - values[i] & 0xFF)
            base = values[i]
            out += write_varint(
                zigzag_encode(base) if signed else base
            )
            i += run
            continue
        # literal group: gather until a run of 3 starts or 128 reached
        lit = [values[i]]
        i += 1
        while i < n and len(lit) < 128:
            if (
                i + 2 < n
                and values[i + 1] - values[i]
                == values[i + 2] - values[i + 1]
                and -128 <= values[i + 1] - values[i] <= 127
            ):
                break
            lit.append(values[i])
            i += 1
        out.append((-len(lit)) & 0xFF)
        for v in lit:
            out += write_varint(zigzag_encode(v) if signed else v)
    return bytes(out)


def rle_v1_decode(buf: bytes, count: int, signed: bool) -> list[int]:
    out: list[int] = []
    pos = 0
    while len(out) < count:
        if pos >= len(buf):
            raise ValueError("RLEv1 stream exhausted before row count")
        h = buf[pos]
        pos += 1
        if h < 128:  # run
            run = h + 3
            if pos >= len(buf):
                raise ValueError("RLEv1 run delta truncated")
            delta = buf[pos] if buf[pos] < 128 else buf[pos] - 256
            pos += 1
            raw, pos = read_varint(buf, pos)
            base = zigzag_decode(raw) if signed else raw
            out.extend(base + k * delta for k in range(run))
        else:  # literal group
            for _ in range(256 - h):
                raw, pos = read_varint(buf, pos)
                out.append(zigzag_decode(raw) if signed else raw)
    if len(out) != count or pos != len(buf):
        raise ValueError(
            f"RLEv1 decoded {len(out)} values, consumed {pos}/{len(buf)}"
        )
    return out


# ---------------------------------------------------------------------------
# writer (fixture) and reader
# ---------------------------------------------------------------------------

def make_orc(stripes: list[list[tuple[int, str]]]) -> bytes:
    """A real mini-ORC file of ``struct<id:bigint, name:string>`` rows,
    one entry per stripe."""
    out = bytearray(_MAGIC)
    stripe_infos = []
    total_rows = 0
    for rows in stripes:
        if not rows:
            raise ValueError("empty stripe")
        offset = len(out)
        ids = [r[0] for r in rows]
        names = [r[1].encode("utf-8") for r in rows]
        d_id = rle_v1_encode(ids, signed=True)
        d_len = rle_v1_encode([len(b) for b in names], signed=False)
        d_str = b"".join(names)
        data = d_id + d_str + d_len
        streams = _msg([(1, _msg([(1, _STREAM_DATA), (2, 1), (3, len(d_id))]))])
        streams += _msg([(1, _msg([(1, _STREAM_DATA), (2, 2), (3, len(d_str))]))])
        streams += _msg([(1, _msg([(1, _STREAM_LENGTH), (2, 2), (3, len(d_len))]))])
        encodings = b"".join(_msg([(2, _msg([(1, 0)]))]) for _ in range(3))
        sfooter = streams + encodings
        out += data + sfooter
        stripe_infos.append(
            (offset, len(data), len(sfooter), len(rows))
        )
        total_rows += len(rows)
    content_len = len(out)
    types = (
        _msg([(4, _msg([(1, _KIND_STRUCT), (2, 1), (2, 2),
                        (3, "id"), (3, "name")]))])
        + _msg([(4, _msg([(1, _KIND_LONG)]))])
        + _msg([(4, _msg([(1, _KIND_STRING)]))])
    )
    stripes_pb = b"".join(
        _msg([(3, _msg([(1, off), (2, 0), (3, dl), (4, fl), (5, nr)]))])
        for off, dl, fl, nr in stripe_infos
    )
    footer = (
        _msg([(1, 3), (2, content_len), (6, total_rows)])
        + stripes_pb
        + types
    )
    out += footer
    postscript = _msg([(1, len(footer)), (2, 0)])
    out += postscript
    if len(postscript) > 255:
        raise ValueError("postscript too large")
    out.append(len(postscript))
    return bytes(out)


def _uint(msg: dict, num: int, default=None):
    """Type-checked varint accessor over :func:`_decode_msg` output —
    a corrupted tag can deliver bytes where a count belongs, and that
    must quarantine as ValueError, not escape as TypeError."""
    vals = msg.get(num)
    if vals is None:
        return default
    v = vals[0]
    if not isinstance(v, int) or v < 0:
        raise ValueError(f"footer field {num} is not a valid count")
    return v


def parse_orc(payload: bytes) -> dict:
    """Tail-first walk: ``{n_stripes, n_rows, sum_ids, n_names,
    name_bytes, rows}`` with ``rows`` the decoded (id, name) list."""
    if payload[:3] != _MAGIC:
        raise ValueError("not an ORC file (bad magic)")
    if len(payload) < 5:
        raise ValueError("ORC file too short")
    ps_len = payload[-1]
    ps_start = len(payload) - 1 - ps_len
    if ps_start <= 3:
        raise ValueError("postscript length out of bounds")
    ps = _decode_msg(payload[ps_start : len(payload) - 1])
    footer_len = _uint(ps, 1)
    compression = _uint(ps, 2, 0)
    if footer_len is None:
        raise ValueError("postscript missing footer length")
    if compression != 0:
        raise ValueError("only NONE compression in scope")
    f_start = ps_start - footer_len
    if f_start < 3:
        raise ValueError("footer length out of bounds")
    footer = _decode_msg(payload[f_start:ps_start])
    total_rows = _uint(footer, 6, 0)
    traw = footer.get(4, [])
    if any(not isinstance(x, bytes) for x in traw):
        raise ValueError("type entry is not a message")
    types = [_decode_msg(t) for t in traw]
    if (
        len(types) != 3
        or _uint(types[0], 1) != _KIND_STRUCT
        or _uint(types[1], 1) != _KIND_LONG
        or _uint(types[2], 1) != _KIND_STRING
    ):
        raise ValueError("only struct<id:bigint,name:string> in scope")
    rows: list[tuple[int, str]] = []
    n_stripes = 0
    for s in footer.get(3, []):
        if not isinstance(s, bytes):
            raise ValueError("stripe information field is not a message")
        info = _decode_msg(s)
        off = _uint(info, 1)
        dlen = _uint(info, 3)
        flen = _uint(info, 4)
        nrows = _uint(info, 5)
        if None in (off, dlen, flen, nrows):
            raise ValueError("stripe information incomplete")
        if off + dlen + flen > f_start:
            raise ValueError("stripe overruns the footer")
        sfooter = _decode_msg(
            payload[off + dlen : off + dlen + flen]
        )
        sizes = {}
        for raw in sfooter.get(1, []):
            if not isinstance(raw, bytes):
                raise ValueError("stream descriptor is not a message")
            st = _decode_msg(raw)
            kind = _uint(st, 1, 0)
            col = _uint(st, 2, 0)
            sizes[(col, kind)] = _uint(st, 3, 0)
        need = [(1, _STREAM_DATA), (2, _STREAM_DATA), (2, _STREAM_LENGTH)]
        if any(k not in sizes for k in need):
            raise ValueError("stripe missing required streams")
        p = off
        d_id = payload[p : p + sizes[(1, _STREAM_DATA)]]
        p += sizes[(1, _STREAM_DATA)]
        d_str = payload[p : p + sizes[(2, _STREAM_DATA)]]
        p += sizes[(2, _STREAM_DATA)]
        d_len = payload[p : p + sizes[(2, _STREAM_LENGTH)]]
        p += sizes[(2, _STREAM_LENGTH)]
        if p != off + dlen:
            raise ValueError("stream sizes disagree with stripe dataLength")
        ids = rle_v1_decode(d_id, nrows, signed=True)
        lens = rle_v1_decode(d_len, nrows, signed=False)
        if sum(lens) != len(d_str):
            raise ValueError("string lengths disagree with data stream")
        q = 0
        for i, ln in zip(ids, lens):
            rows.append((i, d_str[q : q + ln].decode("utf-8", "strict")))
            q += ln
        n_stripes += 1
    if len(rows) != total_rows:
        raise ValueError(
            f"footer declares {total_rows} rows, stripes held {len(rows)}"
        )
    return {
        "n_stripes": n_stripes,
        "n_rows": len(rows),
        "sum_ids": sum(i for i, _ in rows),
        "n_names": len({n for _, n in rows}),
        "name_bytes": sum(len(n.encode()) for _, n in rows),
        "rows": rows,
    }
