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


# ---------------------------------------------------------------------------
# real-ORC surface (round 8): RLEv2, PRESENT streams, chunked
# compression — what pyarrow/Hive writers actually emit
# ---------------------------------------------------------------------------

#: RLEv2 5-bit width codes (ORCv1 spec "Direct" table)
_FBS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
        19, 20, 21, 22, 23, 24, 26, 28, 30, 32, 40, 48, 56, 64]


def _bits_be(buf: bytes, bit_pos: int, width: int) -> int:
    """Big-endian bit-packed read (RLEv2 packs MSB-first)."""
    out = 0
    for _ in range(width):
        byte = bit_pos >> 3
        if byte >= len(buf):
            raise ValueError("RLEv2 bit-packed run truncated")
        out = (out << 1) | ((buf[byte] >> (7 - (bit_pos & 7))) & 1)
        bit_pos += 1
    return out


def rle_v2_decode(buf: bytes, count: int, signed: bool) -> list[int]:
    """ORC RLEv2: SHORT_REPEAT / DIRECT / PATCHED_BASE / DELTA
    sub-encodings (ORCv1 spec §Run-length encoding v2)."""
    out: list[int] = []
    pos = 0
    while len(out) < count:
        if pos >= len(buf):
            raise ValueError("RLEv2 stream truncated")
        h = buf[pos]
        enc = h >> 6
        if enc == 0:  # SHORT_REPEAT
            w = ((h >> 3) & 7) + 1
            rep = (h & 7) + 3
            if pos + 1 + w > len(buf):
                raise ValueError("RLEv2 short-repeat truncated")
            v = int.from_bytes(buf[pos + 1 : pos + 1 + w], "big")
            if signed:
                v = zigzag_decode(v)
            out.extend([v] * rep)
            pos += 1 + w
        elif enc == 1:  # DIRECT
            if pos + 2 > len(buf):
                raise ValueError("RLEv2 direct header truncated")
            w = _FBS[(h >> 1) & 0x1F]
            ln = (((h & 1) << 8) | buf[pos + 1]) + 1
            pos += 2
            bit = pos * 8
            for _ in range(ln):
                v = _bits_be(buf, bit, w)
                bit += w
                out.append(zigzag_decode(v) if signed else v)
            pos = (bit + 7) >> 3
        elif enc == 2:  # PATCHED_BASE
            if pos + 4 > len(buf):
                raise ValueError("RLEv2 patched-base header truncated")
            w = _FBS[(h >> 1) & 0x1F]
            ln = (((h & 1) << 8) | buf[pos + 1]) + 1
            b3, b4 = buf[pos + 2], buf[pos + 3]
            bw = ((b3 >> 5) & 7) + 1          # base value bytes
            pw = _FBS[b3 & 0x1F]              # patch value width
            pgw = ((b4 >> 5) & 7) + 1         # patch gap width (bits)
            pl = b4 & 0x1F                    # patch list length
            pos += 4
            if pos + bw > len(buf):
                raise ValueError("RLEv2 patched base truncated")
            base = int.from_bytes(buf[pos : pos + bw], "big")
            sign_mask = 1 << (bw * 8 - 1)
            if base & sign_mask:  # MSB is a sign bit (sign-magnitude)
                base = -(base & (sign_mask - 1))
            pos += bw
            bit = pos * 8
            vals = []
            for _ in range(ln):
                vals.append(_bits_be(buf, bit, w))
                bit += w
            pos = (bit + 7) >> 3
            # patch entries are (gap << pw) | patch pairs, each packed
            # at closestFixedBits(pgw + pw) bits, continuous MSB-first
            # (the Java/C++ readers' rule — NOT per-entry byte padding)
            pwidth = pgw + pw
            entry_w = next(b for b in _FBS if b >= pwidth)
            bit = pos * 8
            idx = 0
            for _ in range(pl):
                entry = _bits_be(buf, bit, entry_w)
                bit += entry_w
                gap = entry >> pw
                patch = entry & ((1 << pw) - 1)
                idx += gap
                if idx >= ln:
                    raise ValueError("RLEv2 patch index out of range")
                vals[idx] |= patch << w
            pos = (bit + 7) >> 3
            out.extend(base + v for v in vals)
        else:  # DELTA
            w_code = (h >> 1) & 0x1F
            w = 0 if w_code == 0 else _FBS[w_code]
            if pos + 2 > len(buf):
                raise ValueError("RLEv2 delta header truncated")
            ln = (((h & 1) << 8) | buf[pos + 1]) + 1
            pos += 2
            if signed:
                raw, pos = read_varint(buf, pos)
                base = zigzag_decode(raw)
            else:
                base, pos = read_varint(buf, pos)
            draw, pos = read_varint(buf, pos)
            delta_base = zigzag_decode(draw)
            seq = [base]
            if ln > 1:
                seq.append(base + delta_base)
            if w == 0:
                while len(seq) < ln:
                    seq.append(seq[-1] + delta_base)
            else:
                bit = pos * 8
                sign = -1 if delta_base < 0 else 1
                while len(seq) < ln:
                    d = _bits_be(buf, bit, w)
                    bit += w
                    seq.append(seq[-1] + sign * d)
                pos = (bit + 7) >> 3
            out.extend(seq)
    if len(out) != count:
        raise ValueError("RLEv2 run overran the value count")
    return out


def _byte_rle_decode(buf: bytes, n: int) -> bytes:
    """ORC byte-RLE (PRESENT streams ride it): header 0..127 → run of
    header+3 copies of the next byte; 128..255 → 256-header literals."""
    out = bytearray()
    pos = 0
    while len(out) < n:
        if pos >= len(buf):
            raise ValueError("byte-RLE stream truncated")
        h = buf[pos]
        pos += 1
        if h < 128:
            if pos >= len(buf):
                raise ValueError("byte-RLE run value truncated")
            out.extend(bytes([buf[pos]]) * (h + 3))
            pos += 1
        else:
            lit = 256 - h
            if pos + lit > len(buf):
                raise ValueError("byte-RLE literals truncated")
            out.extend(buf[pos : pos + lit])
            pos += lit
    return bytes(out[:n])


def _bool_decode(buf: bytes, n: int) -> list[bool]:
    """PRESENT stream: byte-RLE over bit-packed bytes, MSB first."""
    raw = _byte_rle_decode(buf, (n + 7) // 8)
    return [bool((raw[i >> 3] >> (7 - (i & 7))) & 1) for i in range(n)]


def _orc_decompress(buf: bytes, kind: int) -> bytes:
    """ORC chunked stream compression: 3-byte LE header per chunk,
    ``(length << 1) | is_original``.  Kinds: 1 ZLIB (raw deflate),
    2 SNAPPY, 4 LZ4 (raw block), 5 ZSTD — the snappy/lz4/zstd chunks
    decode through this repo's own codecs."""
    if kind == 0:
        return buf
    out = bytearray()
    pos = 0
    while pos < len(buf):
        if pos + 3 > len(buf):
            raise ValueError("ORC compression chunk header truncated")
        h = int.from_bytes(buf[pos : pos + 3], "little")
        orig, ln = h & 1, h >> 1
        pos += 3
        if pos + ln > len(buf):
            raise ValueError("ORC compression chunk truncated")
        body = buf[pos : pos + ln]
        pos += ln
        if orig:
            out += body
        elif kind == 1:
            import zlib

            try:
                out += zlib.decompress(body, -15)
            except zlib.error as e:
                raise ValueError(f"ORC zlib chunk: {e}") from e
        elif kind == 2:
            from .snappy import snappy_decompress

            out += snappy_decompress(body)
        elif kind == 4:
            from .lz4 import lz4_block_decompress

            out += lz4_block_decompress(body)
        elif kind == 5:
            from .zstd import zstd_decompress

            out += zstd_decompress(body)
        else:
            raise ValueError(f"ORC compression kind {kind} out of scope")
    return bytes(out)


# ORC type kinds in decode scope (ORCv1 spec Types message; DATE=15)
_SCALAR_KINDS = {
    0: "boolean", 2: "short", 3: "int", 4: "long", 5: "float",
    6: "double", 7: "string", 9: "timestamp", 15: "date",
}
#: ORC timestamps count seconds from 2015-01-01 00:00:00 (spec §
#: Timestamp Columns), not the unix epoch
_ORC_TS_EPOCH = 1420070400
_STREAM_SECONDARY = 5
_STREAM_PRESENT, _STREAM_DICT_DATA = 0, 3
# ColumnEncoding kinds: DIRECT, DICTIONARY (RLEv1), DIRECT_V2,
# DICTIONARY_V2 (RLEv2)
_ENC_DIRECT, _ENC_DICT, _ENC_DIRECT_V2, _ENC_DICT_V2 = 0, 1, 2, 3


def _decode_string_column(
    streams: dict, enc: int, col: int, nnz: int, dict_size: int
) -> list[str]:
    """DIRECT strings (LENGTH + DATA) or DICTIONARY strings
    (DATA = indices into the dictionary; DICTIONARY_DATA + LENGTH
    describe the ``dict_size`` sorted entries — the size rides the
    ColumnEncoding message, field 2) — ORCv1 spec §String Columns.
    Hive/Java writers emit DICTIONARY_V2 for low-cardinality strings
    by default; liborc never does, so the dictionary path is
    interop-pinned the other way round (hand writer → pyarrow reads
    it, tests/test_orclite.py)."""
    v1 = enc in (_ENC_DIRECT, _ENC_DICT)
    ints = rle_v1_decode if v1 else rle_v2_decode
    if enc in (_ENC_DIRECT, _ENC_DIRECT_V2):
        lens = ints(streams.get((col, _STREAM_LENGTH), b""), nnz, False)
        blob = streams.get((col, _STREAM_DATA), b"")
        if sum(lens) != len(blob):
            raise ValueError("string lengths disagree with data stream")
        out, q = [], 0
        for ln in lens:
            out.append(blob[q : q + ln].decode("utf-8", "strict"))
            q += ln
        return out
    blob = streams.get((col, _STREAM_DICT_DATA), b"")
    lens = ints(streams.get((col, _STREAM_LENGTH), b""), dict_size, False)
    if sum(lens) != len(blob):
        raise ValueError("dictionary lengths disagree with its blob")
    entries, q = [], 0
    for ln in lens:
        entries.append(blob[q : q + ln].decode("utf-8", "strict"))
        q += ln
    idxs = ints(streams.get((col, _STREAM_DATA), b""), nnz, False)
    try:
        return [entries[i] for i in idxs]
    except IndexError:
        raise ValueError("dictionary index out of range") from None


def rle_v2_encode_direct(values: list[int], signed: bool) -> bytes:
    """RLEv2 encoder emitting only DIRECT runs (≤512 values, MSB-first
    bit packing at the closest _FBS width; signed values zigzagged) —
    enough to WRITE dictionary-encoded fixtures that liborc reads
    back, since liborc itself never emits dictionary encodings."""
    out = bytearray()
    i = 0
    while i < len(values):
        chunk = values[i : i + 512]
        enc_vals = [zigzag_encode(v) if signed else v for v in chunk]
        maxb = max(1, max(v.bit_length() for v in enc_vals))
        w = next(b for b in _FBS if b >= maxb)
        wcode = _FBS.index(w)
        ln = len(chunk) - 1
        out.append((1 << 6) | (wcode << 1) | (ln >> 8))
        out.append(ln & 0xFF)
        bitbuf = nbits = 0
        for v in enc_vals:
            bitbuf = (bitbuf << w) | v
            nbits += w
            while nbits >= 8:
                nbits -= 8
                out.append((bitbuf >> nbits) & 0xFF)
                bitbuf &= (1 << nbits) - 1
        if nbits:
            out.append((bitbuf << (8 - nbits)) & 0xFF)
        i += 512
    return bytes(out)


def make_orc_dict_strings(stripes: list[list[tuple[int, str]]]) -> bytes:
    """A real ORC file of ``struct<id:bigint, name:string>`` whose
    string column is DICTIONARY_V2-encoded (sorted dictionary,
    RLEv2-DIRECT index/length runs) — the layout Hive/Java writers emit
    for low-cardinality strings by default, which liborc never writes.
    NONE compression; liborc reads it back cell-for-cell
    (tests/test_orclite.py)."""
    out = bytearray(_MAGIC)
    stripe_infos = []
    total_rows = 0
    for rows in stripes:
        if not rows:
            raise ValueError("empty stripe")
        offset = len(out)
        ids = [r[0] for r in rows]
        names = [r[1] for r in rows]
        entries = sorted(set(names))
        lookup = {s: i for i, s in enumerate(entries)}
        d_id = rle_v2_encode_direct(ids, signed=True)
        d_idx = rle_v2_encode_direct([lookup[s] for s in names], False)
        blob = "".join(entries).encode("utf-8")
        d_len = rle_v2_encode_direct(
            [len(s.encode("utf-8")) for s in entries], False
        )
        data = d_id + d_idx + d_len + blob
        streams = _msg(
            [(1, _msg([(1, _STREAM_DATA), (2, 1), (3, len(d_id))]))]
        )
        streams += _msg(
            [(1, _msg([(1, _STREAM_DATA), (2, 2), (3, len(d_idx))]))]
        )
        streams += _msg(
            [(1, _msg([(1, _STREAM_LENGTH), (2, 2), (3, len(d_len))]))]
        )
        streams += _msg(
            [(1, _msg([(1, _STREAM_DICT_DATA), (2, 2), (3, len(blob))]))]
        )
        encodings = _msg([(2, _msg([(1, _ENC_DIRECT)]))])  # struct
        encodings += _msg([(2, _msg([(1, _ENC_DIRECT_V2)]))])  # id
        encodings += _msg(
            [(2, _msg([(1, _ENC_DICT_V2), (2, len(entries))]))]
        )
        sfooter = streams + encodings
        out += data + sfooter
        stripe_infos.append((offset, len(data), len(sfooter), len(rows)))
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
    # postscript: footerLength, NONE compression, version [0,12],
    # writerVersion, magic — the fields liborc checks on open
    postscript = (
        _msg([(1, len(footer)), (2, 0)])
        + _emit(4, 0) + write_varint(0)
        + _emit(4, 0) + write_varint(12)
        + _msg([(6, 1)])
        + _msg([(8000, "ORC")])
    )
    out += postscript
    if len(postscript) > 255:
        raise ValueError("postscript too large")
    out.append(len(postscript))
    return bytes(out)


def parse_orc_file(payload: bytes) -> dict:
    """REAL-writer ORC walk (pyarrow/Hive layout): chunked compression
    (NONE/ZLIB/SNAPPY/LZ4/ZSTD), index sections skipped by
    indexLength, PRESENT streams for nullable columns, both integer
    encodings (DIRECT → RLEv1, DIRECT_V2 → RLEv2), and — round 9 —
    DICTIONARY/DICTIONARY_V2 strings plus boolean/short/int/long/
    float/double/date columns over any flat struct schema.  Deeper
    nesting (struct/list/map/union children), timestamps and decimals
    quarantine loudly.  Returns ``{n_stripes, n_rows, n_nulls,
    names, columns}`` (``columns`` name → null-aligned values; dates
    as epoch days, floats as Python floats) plus, for the legacy
    ``struct<id:bigint, name:string>`` schema, the original summary
    fields and ``rows``."""
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
    f_start = ps_start - footer_len
    if f_start < 3:
        raise ValueError("footer length out of bounds")
    footer = _decode_msg(
        _orc_decompress(payload[f_start:ps_start], compression)
    )
    total_rows = _uint(footer, 6, 0)
    traw = footer.get(4, [])
    if any(not isinstance(x, bytes) for x in traw):
        raise ValueError("type entry is not a message")
    types = [_decode_msg(t) for t in traw]
    if not types or _uint(types[0], 1) != _KIND_STRUCT:
        raise ValueError("root type is not a struct")
    field_names = [
        n.decode("utf-8", "strict") if isinstance(n, bytes) else str(n)
        for n in types[0].get(3, [])
    ]
    ncols = len(types) - 1
    if len(field_names) != ncols or ncols == 0:
        raise ValueError("struct field names disagree with subtypes")
    kinds: list[str] = []
    for t in types[1:]:
        k = _uint(t, 1, 0)
        if k not in _SCALAR_KINDS:
            raise ValueError(
                f"ORC type kind {k} out of decode scope (flat scalar "
                "structs only)"
            )
        kinds.append(_SCALAR_KINDS[k])
    columns: dict[str, list] = {n: [] for n in field_names}
    n_stripes = n_nulls = n_total = 0
    for s in footer.get(3, []):
        if not isinstance(s, bytes):
            raise ValueError("stripe information field is not a message")
        info = _decode_msg(s)
        off = _uint(info, 1)
        ilen = _uint(info, 2, 0)
        dlen = _uint(info, 3)
        flen = _uint(info, 4)
        nrows = _uint(info, 5)
        if None in (off, dlen, flen, nrows):
            raise ValueError("stripe information incomplete")
        if off + ilen + dlen + flen > f_start:
            raise ValueError("stripe overruns the footer")
        sfooter = _decode_msg(
            _orc_decompress(
                payload[off + ilen + dlen : off + ilen + dlen + flen],
                compression,
            )
        )
        enc_msgs = [_decode_msg(raw) for raw in sfooter.get(2, [])]
        encodings = [_uint(m, 1, 0) for m in enc_msgs]
        dict_sizes = [_uint(m, 2, 0) for m in enc_msgs]
        if len(encodings) != ncols + 1:
            raise ValueError("stripe missing column encodings")
        streams: dict[tuple[int, int], bytes] = {}
        p = off + ilen  # data section starts after the index section
        for raw in sfooter.get(1, []):
            st = _decode_msg(raw)
            kind = _uint(st, 1, 0)
            col = _uint(st, 2, 0)
            ln = _uint(st, 3, 0)
            if kind in (6, 7, 8):  # ROW_INDEX / bloom: index section
                continue
            streams[(col, kind)] = _orc_decompress(
                payload[p : p + ln], compression
            )
            p += ln
        if p != off + ilen + dlen:
            raise ValueError("stream sizes disagree with stripe dataLength")
        for c in range(1, ncols + 1):
            kind = kinds[c - 1]
            enc = encodings[c]
            pres = (
                _bool_decode(streams[(c, _STREAM_PRESENT)], nrows)
                if (c, _STREAM_PRESENT) in streams
                else [True] * nrows
            )
            nnz = sum(pres)
            v1 = enc in (_ENC_DIRECT, _ENC_DICT)
            ints = rle_v1_decode if v1 else rle_v2_decode
            if kind == "string":
                vals: list = _decode_string_column(
                    streams, enc, c, nnz, dict_sizes[c]
                )
            elif enc not in (_ENC_DIRECT, _ENC_DIRECT_V2):
                raise ValueError(
                    f"dictionary encoding on a non-string column {c}"
                )
            elif kind in ("short", "int", "long", "date"):
                vals = ints(
                    streams.get((c, _STREAM_DATA), b""), nnz, True
                )
            elif kind == "timestamp":
                # DATA = signed seconds from the 2015 base; SECONDARY =
                # nanos with the trailing-zero trick (low 3 bits k != 0
                # → k+1 decimal zeros were removed).  liborc truncates
                # seconds toward ZERO and carries SIGNED nanos for the
                # (-1s, 0) range (e.g. -1µs ships as secs=0, encoded
                # nanos -6 → -1000ns), so the nominally-unsigned
                # SECONDARY stream is reinterpreted signed-64 here —
                # pinned by the pyarrow interop tests on pre-1970
                # values.  Emitted as unix epoch MICROS, the same
                # convention as the INT96 parquet path.
                secs = ints(
                    streams.get((c, _STREAM_DATA), b""), nnz, True
                )
                raw_nanos = ints(
                    streams.get((c, _STREAM_SECONDARY), b""), nnz, False
                )
                vals = []
                for sec, rn in zip(secs, raw_nanos):
                    if rn >= 1 << 63:
                        rn -= 1 << 64
                    k = rn & 7
                    nanos = rn >> 3
                    if k:
                        nanos *= 10 ** (k + 1)
                    if not -999_999_999 <= nanos <= 999_999_999:
                        raise ValueError("timestamp nanos out of range")
                    base = sec + _ORC_TS_EPOCH
                    micros, rem = divmod(base * 1_000_000_000
                                         + nanos, 1000)
                    if rem:
                        raise ValueError(
                            "timestamp finer than microseconds out of "
                            "decode scope"
                        )
                    vals.append(micros)
            elif kind in ("float", "double"):
                import struct as _struct

                w, f = (4, "f") if kind == "float" else (8, "d")
                raw = streams.get((c, _STREAM_DATA), b"")
                if len(raw) != w * nnz:
                    raise ValueError(
                        f"{kind} stream size disagrees with value count"
                    )
                vals = list(_struct.unpack(f"<{nnz}{f}", raw))
            else:  # boolean
                vals = _bool_decode(streams.get((c, _STREAM_DATA), b""),
                                    nnz)
            it = iter(vals)
            got = [next(it) if ok else None for ok in pres]
            n_nulls += nrows - nnz
            columns[field_names[c - 1]].extend(got)
        n_total += nrows
        n_stripes += 1
    if n_total != total_rows:
        raise ValueError(
            f"footer declares {total_rows} rows, stripes held {n_total}"
        )
    out: dict = {
        "n_stripes": n_stripes,
        "n_rows": n_total,
        "n_nulls": n_nulls,
        "names": field_names,
        "columns": columns,
    }
    if field_names == ["id", "name"] and kinds == ["long", "string"]:
        rows = list(zip(columns["id"], columns["name"]))
        out.update(
            rows=rows,
            sum_ids=sum(i for i, _ in rows if i is not None),
            n_names=len({n for _, n in rows if n is not None}),
            name_bytes=sum(
                len(n.encode()) for _, n in rows if n is not None
            ),
        )
    return out
