"""BSON document-stream walk — MongoDB dump ingestion.

The third document-database wire format next to protobuf/Avro/
MessagePack: ``mongodump`` emits concatenated BSON documents, each
self-framed by a leading little-endian int32 TOTAL length (including
the length field and the trailing 0x00) — the off-by-four every first
parser makes, pinned in tests.  Implemented from the public spec
(bsonspec.org, version 1.1); no bson library exists in this container.

Element types in scope: string (0x02 — int32 byte length INCLUDING
the NUL), embedded document (0x03), array (0x04 — a document whose
keys are "0","1",...), binary (0x05 with subtype), boolean (0x08),
null (0x0A), int32 (0x10) and int64 (0x12), all little-endian.
Doubles (0x01) quarantine loudly (the engine's exact-integer
discipline), as do unknown type tags, bad framing, missing
terminators, and over-depth nesting.
"""

from __future__ import annotations

import struct

_MAX_DEPTH = 32


def _cstring(name: str) -> bytes:
    b = name.encode("utf-8")
    if b"\x00" in b:
        raise ValueError("BSON element names cannot contain NUL")
    return b + b"\x00"


def _element(name: str, value) -> bytes:
    if value is None:
        return b"\x0a" + _cstring(name)
    if value is True or value is False:
        return b"\x08" + _cstring(name) + (b"\x01" if value else b"\x00")
    if isinstance(value, int):
        if -(1 << 31) <= value < 1 << 31:
            return b"\x10" + _cstring(name) + struct.pack("<i", value)
        return b"\x12" + _cstring(name) + struct.pack("<q", value)
    if isinstance(value, str):
        raw = value.encode("utf-8") + b"\x00"
        return (
            b"\x02" + _cstring(name) + struct.pack("<i", len(raw)) + raw
        )
    if isinstance(value, (bytes, bytearray)):
        return (
            b"\x05"
            + _cstring(name)
            + struct.pack("<i", len(value))
            + b"\x00"  # generic subtype
            + bytes(value)
        )
    if isinstance(value, list):
        return b"\x04" + _cstring(name) + pack_document(
            {str(i): v for i, v in enumerate(value)}
        )
    if isinstance(value, dict):
        return b"\x03" + _cstring(name) + pack_document(value)
    raise ValueError(f"unsupported type {type(value).__name__}")


def pack_document(doc: dict) -> bytes:
    body = b"".join(_element(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _read_cstring(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.find(b"\x00", pos)
    if end < 0:
        raise ValueError(f"unterminated element name at {pos}")
    return buf[pos:end].decode("utf-8", "strict"), end + 1


def unpack_document(buf: bytes, pos: int, depth: int = 0):
    """Decode one BSON document at ``pos`` → ``(dict, new_pos)``."""
    if depth > _MAX_DEPTH:
        raise ValueError("BSON nesting exceeds depth guard")
    if pos + 4 > len(buf):
        raise ValueError(f"BSON length truncated at {pos}")
    total = struct.unpack_from("<i", buf, pos)[0]
    # total INCLUDES the 4 length bytes and the trailing 0x00
    if total < 5 or pos + total > len(buf):
        raise ValueError(f"BSON document at {pos} declares {total} bytes")
    end = pos + total
    if buf[end - 1] != 0:
        raise ValueError(f"BSON document at {pos} missing terminator")
    pos += 4
    out: dict = {}
    while pos < end - 1:
        t = buf[pos]
        pos += 1
        name, pos = _read_cstring(buf, pos)
        if t == 0x0A:
            out[name] = None
        elif t == 0x08:
            if buf[pos] not in (0, 1):
                raise ValueError(f"BSON bool byte 0x{buf[pos]:02x}")
            out[name] = buf[pos] == 1
            pos += 1
        elif t == 0x10:
            if pos + 4 > end:
                raise ValueError("int32 truncated")
            out[name] = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        elif t == 0x12:
            if pos + 8 > end:
                raise ValueError("int64 truncated")
            out[name] = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif t == 0x02:
            if pos + 4 > end:
                raise ValueError("string length truncated")
            ln = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
            if ln < 1 or pos + ln > end or buf[pos + ln - 1] != 0:
                raise ValueError(f"bad BSON string framing at {pos}")
            out[name] = buf[pos : pos + ln - 1].decode("utf-8", "strict")
            pos += ln
        elif t == 0x05:
            if pos + 5 > end:
                raise ValueError("binary header truncated")
            ln = struct.unpack_from("<i", buf, pos)[0]
            pos += 5  # length + subtype byte
            if ln < 0 or pos + ln > end:
                raise ValueError("binary payload truncated")
            out[name] = buf[pos : pos + ln]
            pos += ln
        elif t in (0x03, 0x04):
            sub, pos = unpack_document(buf, pos, depth + 1)
            if t == 0x04:
                keys = [str(i) for i in range(len(sub))]
                if list(sub.keys()) != keys:
                    raise ValueError("BSON array keys must be 0..n-1")
                out[name] = list(sub.values())
            else:
                out[name] = sub
        elif t == 0x01:
            raise ValueError("double BSON values are out of engine scope")
        else:
            raise ValueError(f"unsupported BSON type 0x{t:02x}")
    if pos != end - 1:
        raise ValueError("BSON elements overrun the declared length")
    return out, end


def parse_bson_stream(payload: bytes) -> dict:
    """Walk concatenated documents (the mongodump shape):
    ``{n_docs, sum_ints, n_strings, n_nested, blob_bytes, n_nulls,
    n_true}`` — exact integers over all reachable values."""
    pos = 0
    n = sum_ints = n_strings = n_nested = blob_bytes = 0
    n_nulls = n_true = 0

    def visit(v):
        nonlocal sum_ints, n_strings, n_nested, blob_bytes, n_nulls, n_true
        if v is None:
            n_nulls += 1
        elif v is True:
            n_true += 1
        elif v is False:
            pass
        elif isinstance(v, int):
            sum_ints += v
        elif isinstance(v, str):
            n_strings += 1
        elif isinstance(v, bytes):
            blob_bytes += len(v)
        elif isinstance(v, list):
            n_nested += 1
            for x in v:
                visit(x)
        elif isinstance(v, dict):
            n_nested += 1
            for x in v.values():
                visit(x)

    while pos < len(payload):
        doc, pos = unpack_document(payload, pos)
        n += 1
        for v in doc.values():
            visit(v)
    if n == 0:
        raise ValueError("no BSON documents found")
    return {
        "n_docs": n,
        "sum_ints": sum_ints,
        "n_strings": n_strings,
        "n_nested": n_nested,
        "blob_bytes": blob_bytes,
        "n_nulls": n_nulls,
        "n_true": n_true,
    }
