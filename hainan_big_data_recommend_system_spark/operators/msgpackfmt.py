"""MessagePack stream walk — the compact JSON-family wire format.

After protobuf (operators/pbwire.py) and Avro (operators/avrocf.py),
MessagePack is the third serialization a log-ingestion engine meets
(Fluentd's native format — crawl/telemetry shippers emit it by
default).  Objects are SELF-FRAMING via the first byte, so a stream is
just concatenated objects; no msgpack library exists in this
container, so encoder (fixture) and decoder implement the public spec
(msgpack.org/spec) directly:

- fixint ``0x00-0x7f`` / negative fixint ``0xe0-0xff`` — the sign
  trap: ``0xe0`` is −32, NOT 224;
- fixstr ``0xa0-0xbf``, str8/16/32 ``0xd9-0xdb`` (UTF-8);
- fixarray ``0x90-0x9f`` + array16/32, fixmap ``0x80-0x8f`` +
  map16/32 — nested, walked recursively with a depth guard;
- uint8-64 ``0xcc-0xcf``, int8-64 ``0xd0-0xd3`` (big-endian, int64
  sign-extended), bin8-32 ``0xc4-0xc6``, nil/false/true
  ``0xc0/0xc2/0xc3``.

Floats (0xca/0xcb) are deliberately OUT of scope — the engine's
exact-integer discipline — and quarantine loudly.  Truncation,
reserved bytes (0xc1), and over-depth nesting raise ValueError for the
standard quarantine path.
"""

from __future__ import annotations

_MAX_DEPTH = 32


def pack(obj) -> bytes:
    """Encode ints, strs, bytes, bools, None, lists and dicts."""
    if obj is None:
        return b"\xc0"
    if obj is True:
        return b"\xc3"
    if obj is False:
        return b"\xc2"
    if isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            return bytes([obj])
        if -32 <= obj < 0:
            return bytes([obj & 0xFF])
        if obj >= 0:
            for code, n in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if obj < 1 << (8 * n):
                    return bytes([code]) + obj.to_bytes(n, "big")
            raise ValueError("integer exceeds uint64")
        for code, n in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * n - 1)) <= obj:
                return bytes([code]) + obj.to_bytes(n, "big", signed=True)
        raise ValueError("integer below int64")
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        if len(b) <= 31:
            return bytes([0xA0 | len(b)]) + b
        if len(b) < 1 << 8:
            return b"\xd9" + bytes([len(b)]) + b
        return b"\xda" + len(b).to_bytes(2, "big") + b
    if isinstance(obj, (bytes, bytearray)):
        b = bytes(obj)
        if len(b) < 1 << 8:
            return b"\xc4" + bytes([len(b)]) + b
        return b"\xc5" + len(b).to_bytes(2, "big") + b
    if isinstance(obj, list):
        if len(obj) <= 15:
            head = bytes([0x90 | len(obj)])
        else:
            head = b"\xdc" + len(obj).to_bytes(2, "big")
        return head + b"".join(pack(x) for x in obj)
    if isinstance(obj, dict):
        if len(obj) <= 15:
            head = bytes([0x80 | len(obj)])
        else:
            head = b"\xde" + len(obj).to_bytes(2, "big")
        return head + b"".join(
            pack(k) + pack(v) for k, v in obj.items()
        )
    raise ValueError(f"unsupported type {type(obj).__name__}")


def _take(buf: bytes, pos: int, n: int) -> tuple[bytes, int]:
    if pos + n > len(buf):
        raise ValueError(f"msgpack truncated at {pos}")
    return buf[pos : pos + n], pos + n


def unpack_one(buf: bytes, pos: int, depth: int = 0):
    """Decode one object at ``pos``; returns ``(obj, new_pos)``."""
    if depth > _MAX_DEPTH:
        raise ValueError("msgpack nesting exceeds depth guard")
    if pos >= len(buf):
        raise ValueError(f"msgpack object expected at {pos}")
    b = buf[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos  # negative fixint: 0xe0 is -32, not 224
    if 0xA0 <= b <= 0xBF:
        raw, pos = _take(buf, pos, b & 0x1F)
        return raw.decode("utf-8", "strict"), pos
    if 0x90 <= b <= 0x9F:
        return _seq(buf, pos, b & 0x0F, depth)
    if 0x80 <= b <= 0x8F:
        return _map(buf, pos, b & 0x0F, depth)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xCC, 0xCD, 0xCE, 0xCF):
        n = 1 << (b - 0xCC)
        raw, pos = _take(buf, pos, n)
        return int.from_bytes(raw, "big"), pos
    if b in (0xD0, 0xD1, 0xD2, 0xD3):
        n = 1 << (b - 0xD0)
        raw, pos = _take(buf, pos, n)
        return int.from_bytes(raw, "big", signed=True), pos
    if b in (0xD9, 0xDA, 0xDB):
        n = 1 << (b - 0xD9)
        raw, pos = _take(buf, pos, n)
        ln = int.from_bytes(raw, "big")
        raw, pos = _take(buf, pos, ln)
        return raw.decode("utf-8", "strict"), pos
    if b in (0xC4, 0xC5, 0xC6):
        n = 1 << (b - 0xC4)
        raw, pos = _take(buf, pos, n)
        ln = int.from_bytes(raw, "big")
        return _take(buf, pos, ln)
    if b in (0xDC, 0xDD):
        n = 2 << (b - 0xDC)
        raw, pos = _take(buf, pos, n)
        return _seq(buf, pos, int.from_bytes(raw, "big"), depth)
    if b in (0xDE, 0xDF):
        n = 2 << (b - 0xDE)
        raw, pos = _take(buf, pos, n)
        return _map(buf, pos, int.from_bytes(raw, "big"), depth)
    if b in (0xCA, 0xCB):
        raise ValueError("float msgpack values are out of engine scope")
    raise ValueError(f"reserved/unsupported msgpack byte 0x{b:02x}")


def _seq(buf, pos, count, depth):
    out = []
    for _ in range(count):
        v, pos = unpack_one(buf, pos, depth + 1)
        out.append(v)
    return out, pos


def _map(buf, pos, count, depth):
    out = {}
    for _ in range(count):
        k, pos = unpack_one(buf, pos, depth + 1)
        if not isinstance(k, (int, str, bytes, bool)) and k is not None:
            # containers as map keys: legal msgpack, but unhashable
            # here and absent from every log schema — quarantine
            raise ValueError("container-typed map key out of scope")
        v, pos = unpack_one(buf, pos, depth + 1)
        out[k] = v
    return out, pos


def parse_msgpack_stream(payload: bytes) -> dict:
    """Walk a stream of concatenated map objects (the Fluentd shape):
    ``{n_records, sum_ints, n_strings, n_nested, blob_bytes,
    n_nulls, n_true}`` — exact integers over every value reachable in
    the stream."""
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
            for k, x in v.items():
                visit(k)
                visit(x)

    while pos < len(payload):
        obj, pos = unpack_one(payload, pos)
        if not isinstance(obj, dict):
            raise ValueError("stream objects must be maps")
        n += 1
        for k, v in obj.items():
            visit(k)
            visit(v)
    if n == 0:
        raise ValueError("no msgpack records found")
    return {
        "n_records": n,
        "sum_ints": sum_ints,
        "n_strings": n_strings,
        "n_nested": n_nested,
        "blob_bytes": blob_bytes,
        "n_nulls": n_nulls,
        "n_true": n_true,
    }
