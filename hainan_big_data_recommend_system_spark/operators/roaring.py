"""Roaring bitmap (de)serialization — the portable interchange format
row-level delete encodings ride on (Delta Lake deletion vectors store a
64-bit RoaringBitmapArray; Iceberg puncher files use the same family).

Implemented from the PUBLIC RoaringFormatSpec
(github.com/RoaringBitmap/RoaringFormatSpec) and Delta's PROTOCOL.md
"Deletion Vectors" section:

- 32-bit portable serialization: a 4-byte cookie — either
  ``SERIAL_COOKIE_NO_RUNCONTAINER`` (12346) + 4-byte container count,
  or ``SERIAL_COOKIE`` (12347) with ``count-1`` in the upper 16 bits
  followed by a run-container bitset — then per-container descriptors
  ``(u16 key, u16 cardinality-1)``, an offset header (present for
  cookie 12346, or 12347 with ≥4 containers), and the containers:
  ARRAY (sorted u16 values), BITMAP (8 KiB fixed), RUN
  (u16 n_runs, then ``(u16 start, u16 length-1)`` pairs).
- 64-bit ``RoaringBitmapArray`` (Delta's "portable" flavor): an 8-byte
  LE bitmap count, then per 32-bit bitmap a 4-byte LE high key + its
  32-bit portable serialization, keys ascending.

The decoder is strict (ValueError quarantine contract): cookie /
container-count / offset-table / cardinality mismatches, unsorted or
duplicate members, and trailing bytes all raise.  The encoder picks
ARRAY/BITMAP/RUN per the spec's size rule (smallest representation),
so roundtrips exercise all three container kinds.
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_BITMAP_BYTES = 8192
_ARRAY_MAX = 4096


# ---------------------------------------------------------------------------
# 32-bit portable
# ---------------------------------------------------------------------------

def _encode_container(values: list[int]) -> tuple[bytes, bool]:
    """Smallest of ARRAY / BITMAP / RUN for sorted u16 ``values`` →
    ``(payload, is_run)``."""
    n = len(values)
    runs: list[tuple[int, int]] = []
    for v in values:
        if runs and v == runs[-1][0] + runs[-1][1] + 1:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((v, 0))
    run_sz = 2 + 4 * len(runs)
    arr_sz = 2 * n
    if run_sz < min(arr_sz, _BITMAP_BYTES):
        body = struct.pack("<H", len(runs)) + b"".join(
            struct.pack("<HH", s, ln) for s, ln in runs
        )
        return body, True
    if n <= _ARRAY_MAX:
        return struct.pack(f"<{n}H", *values), False
    bits = bytearray(_BITMAP_BYTES)
    for v in values:
        bits[v >> 3] |= 1 << (v & 7)
    return bytes(bits), False


def roaring32_serialize(values: list[int]) -> bytes:
    """Portable 32-bit serialization of a sorted, deduplicated list of
    uint32 members."""
    if any(not 0 <= v <= 0xFFFFFFFF for v in values):
        raise ValueError("roaring32 member out of uint32 range")
    if sorted(set(values)) != list(values):
        raise ValueError("roaring32 members must be sorted and unique")
    conts: dict[int, list[int]] = {}
    for v in values:
        conts.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(conts)
    payloads = [_encode_container(conts[k]) for k in keys]
    has_run = any(r for _, r in payloads)
    out = bytearray()
    n = len(keys)
    if has_run:
        out += struct.pack("<I", SERIAL_COOKIE | ((n - 1) << 16))
        flags = bytearray((n + 7) // 8)
        for i, (_, r) in enumerate(payloads):
            if r:
                flags[i >> 3] |= 1 << (i & 7)
        out += flags
    else:
        out += struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, n)
    for k, vals in ((k, conts[k]) for k in keys):
        out += struct.pack("<HH", k, len(vals) - 1)
    write_offsets = (not has_run) or n >= _NO_OFFSET_THRESHOLD
    if write_offsets:
        off_pos = len(out)
        out += b"\x00" * (4 * n)
        offsets = []
        for body, _ in payloads:
            offsets.append(len(out))
            out += body
        for i, off in enumerate(offsets):
            struct.pack_into("<I", out, off_pos + 4 * i, off)
    else:
        for body, _ in payloads:
            out += body
    return bytes(out)


def roaring32_deserialize(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """→ ``(sorted members, bytes consumed past pos)``."""
    if pos + 4 > len(buf):
        raise ValueError("roaring32 cookie truncated")
    cookie = struct.unpack_from("<I", buf, pos)[0]
    start = pos
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        nflag = (n + 7) // 8
        if pos + nflag > len(buf):
            raise ValueError("roaring32 run bitset truncated")
        flags = buf[pos : pos + nflag]
        pos += nflag
        is_run = [bool(flags[i >> 3] & (1 << (i & 7))) for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        if pos + 8 > len(buf):
            raise ValueError("roaring32 container count truncated")
        n = struct.unpack_from("<I", buf, pos + 4)[0]
        pos += 8
        is_run = [False] * n
        has_offsets = True
    else:
        raise ValueError(f"roaring32 bad cookie {cookie}")
    if n == 0:
        raise ValueError("roaring32 with zero containers")
    if pos + 4 * n > len(buf):
        raise ValueError("roaring32 descriptors truncated")
    descs = [struct.unpack_from("<HH", buf, pos + 4 * i) for i in range(n)]
    pos += 4 * n
    offsets = None
    if has_offsets:
        if pos + 4 * n > len(buf):
            raise ValueError("roaring32 offset header truncated")
        offsets = [
            struct.unpack_from("<I", buf, pos + 4 * i)[0] for i in range(n)
        ]
        pos += 4 * n
    out: list[int] = []
    prev_key = -1
    for i, (key, card_m1) in enumerate(descs):
        if key <= prev_key:
            raise ValueError("roaring32 container keys not ascending")
        prev_key = key
        card = card_m1 + 1
        if offsets is not None:
            if start + offsets[i] != pos:
                raise ValueError("roaring32 offset table disagrees")
        base = key << 16
        if is_run[i]:
            if pos + 2 > len(buf):
                raise ValueError("roaring32 run count truncated")
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            if pos + 4 * n_runs > len(buf):
                raise ValueError("roaring32 runs truncated")
            got = 0
            last_end = -1
            for r in range(n_runs):
                s, ln = struct.unpack_from("<HH", buf, pos + 4 * r)
                if s <= last_end:
                    raise ValueError("roaring32 runs overlap")
                if s + ln > 0xFFFF:
                    raise ValueError("roaring32 run overflows u16")
                out.extend(range(base + s, base + s + ln + 1))
                got += ln + 1
                last_end = s + ln
            pos += 4 * n_runs
            if got != card:
                raise ValueError("roaring32 run cardinality mismatch")
        elif card > _ARRAY_MAX:
            if pos + _BITMAP_BYTES > len(buf):
                raise ValueError("roaring32 bitmap truncated")
            got = 0
            for byte_i in range(_BITMAP_BYTES):
                b = buf[pos + byte_i]
                while b:
                    low = b & (-b)
                    out.append(base + (byte_i << 3) + low.bit_length() - 1)
                    got += 1
                    b ^= low
            pos += _BITMAP_BYTES
            if got != card:
                raise ValueError("roaring32 bitmap cardinality mismatch")
        else:
            if pos + 2 * card > len(buf):
                raise ValueError("roaring32 array truncated")
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            if list(vals) != sorted(set(vals)):
                raise ValueError("roaring32 array not sorted/unique")
            out.extend(base + v for v in vals)
            pos += 2 * card
    return out, pos - start


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (Delta's portable flavor)
# ---------------------------------------------------------------------------

def roaring64_serialize(values: list[int]) -> bytes:
    """Delta RoaringBitmapArray portable form: 8-byte LE count of
    32-bit bitmaps, then ascending ``(u32 key, 32-bit portable)``."""
    if sorted(set(values)) != list(values):
        raise ValueError("roaring64 members must be sorted and unique")
    if any(not 0 <= v < 1 << 64 for v in values):
        raise ValueError("roaring64 member out of range")
    groups: dict[int, list[int]] = {}
    for v in values:
        groups.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(groups)))
    for k in sorted(groups):
        out += struct.pack("<I", k)
        out += roaring32_serialize(groups[k])
    return bytes(out)


def roaring64_deserialize(buf: bytes) -> list[int]:
    if len(buf) < 8:
        raise ValueError("roaring64 count truncated")
    (n,) = struct.unpack_from("<Q", buf, 0)
    if n > 1 << 20:
        raise ValueError("roaring64 bitmap count implausible")
    pos = 8
    out: list[int] = []
    prev = -1
    for _ in range(n):
        if pos + 4 > len(buf):
            raise ValueError("roaring64 key truncated")
        (key,) = struct.unpack_from("<I", buf, pos)
        if key <= prev:
            raise ValueError("roaring64 keys not ascending")
        prev = key
        pos += 4
        vals, used = roaring32_deserialize(buf, pos)
        pos += used
        out.extend((key << 32) | v for v in vals)
    if pos != len(buf):
        raise ValueError("roaring64 trailing bytes")
    return out
