"""Snappy (raw block format) decompression — the lake's default codec.

Parquet's de-facto default compression is snappy's RAW BLOCK format
(not the framed stream): a uvarint uncompressed length followed by
tagged elements — literals and LZ77 back-references whose copies may
overlap their own output (the classic run-amplification trick), with
1/2/4-byte offset encodings selected by the low tag bits.

Public knowledge: google/snappy format_description.txt.  Implemented
here so the parquet walk (operators/parquetfmt.py) can decode REAL
arrow-written column chunks end-to-end; verified in tests against
DuckDB reading the same files — a wrong copy-offset or length cannot
survive that gate.  ValueError-only on malformed input (the fleet-wide
decoder contract).
"""

from __future__ import annotations


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy length varint truncated")
        if shift > 35:
            raise ValueError("snappy length varint overlong")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def snappy_decompress(buf: bytes) -> bytes:
    """Decode one raw snappy block."""
    total, pos = _uvarint(buf, 0)
    if total > (1 << 31):
        raise ValueError("snappy declared length implausible")
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                nbytes = ln - 60
                if pos + nbytes > n:
                    raise ValueError("snappy literal length truncated")
                ln = int.from_bytes(buf[pos : pos + nbytes], "little") + 1
                pos += nbytes
            if pos + ln > n:
                raise ValueError("snappy literal body truncated")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            if pos >= n:
                raise ValueError("snappy copy1 offset truncated")
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy copy2 offset truncated")
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy copy4 offset truncated")
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy copy offset out of range")
        if off >= ln:  # disjoint: one slice
            start = len(out) - off
            out += out[start : start + ln]
        else:  # overlapping: the run-amplification path
            start = len(out) - off
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != total:
        raise ValueError(
            f"snappy decoded {len(out)} bytes, header declared {total}"
        )
    return bytes(out)
