"""Parquet split-block Bloom filters — point-lookup file skipping.

Min/max stats answer RANGE probes; a point lookup on a high-cardinality
unsorted column (user id, URL, document hash) is served by the parquet
SPLIT-BLOCK BLOOM FILTER (SBBF): per column chunk, a bitset of 256-bit
blocks where each inserted value sets one bit in each of the block's
eight 32-bit words.  A membership probe that misses ANY of the eight
bits proves the value absent from the chunk — at 100 TB that is the
lever that answers "which files could hold user X" by reading a few KB
of bitset per file instead of scanning a byte of data.

Everything here is from the PUBLIC parquet-format spec
(github.com/apache/parquet-format: BloomFilter.md — block layout, the
eight salt constants, the block-index formula; Thrift BloomFilterHeader)
and the public xxHash specification (github.com/Cyan4973/xxHash
xxhash_spec.md — XXH64 with seed 0, the value hash the spec mandates).
Values are hashed in their parquet PLAIN encoding: little-endian
2's-complement for integers, the RAW bytes (no length prefix) for
BYTE_ARRAY — matching parquet-mr, which is what Spark writes, so the
round trip is tested against Spark-written files, not our own writer.

ValueError-only decode contract like every decoder in the fleet.
Reference parity: the reference has no indexes at all (pandas full
scans); bloom skipping is the point-lookup lever its per-user queries
(guessLike_u_like.py) would need first at lake scale.
"""

from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    """XXH64 from the public spec — the hash the parquet bloom filter
    mandates (seed 0)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, struct.unpack_from("<Q", data, i)[0])
            v2 = _round(v2, struct.unpack_from("<Q", data, i + 8)[0])
            v3 = _round(v3, struct.unpack_from("<Q", data, i + 16)[0])
            v4 = _round(v4, struct.unpack_from("<Q", data, i + 24)[0])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, struct.unpack_from("<Q", data, i)[0])
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (struct.unpack_from("<I", data, i)[0] * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


#: BloomFilter.md's eight odd salt constants — one per 32-bit word of
#: a 256-bit block; bit position = top 5 bits of (key * salt) mod 2^32.
_SALT = (0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
         0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31)

_BLOCK_BYTES = 32


def sbbf_might_contain(bitset: bytes, h: int) -> bool:
    """Split-block membership probe: block index from the high 32 hash
    bits (fastrange), then one salted bit per 32-bit word — ALL eight
    must be set."""
    if len(bitset) < _BLOCK_BYTES or len(bitset) % _BLOCK_BYTES:
        raise ValueError("bloom bitset not a multiple of 32 bytes")
    n_blocks = len(bitset) // _BLOCK_BYTES
    block = (((h >> 32) & 0xFFFFFFFF) * n_blocks) >> 32
    key = h & 0xFFFFFFFF
    base = block * _BLOCK_BYTES
    for i in range(8):
        bit = ((key * _SALT[i]) & 0xFFFFFFFF) >> 27
        (word,) = struct.unpack_from("<I", bitset, base + 4 * i)
        if not (word >> bit) & 1:
            return False
    return True


def plain_encode(value, physical_type: str = "INT64") -> bytes | None:
    """The parquet PLAIN encoding the spec says to hash: LE
    2's-complement at the COLUMN'S physical width for ints (an INT32
    column hashes 4 bytes — hashing 8 would false-negative every
    probe), raw UTF-8/bytes (no length prefix) for strings/bytes —
    what parquet-mr hashes.  Returns None when the value cannot exist
    in the column at all (out of the type's range), which is proof of
    absence without touching the filter."""
    if isinstance(value, bool):
        raise ValueError("bloom probes on booleans are pointless")
    if isinstance(value, int):
        width = 4 if physical_type == "INT32" else 8
        if physical_type not in ("INT32", "INT64"):
            raise ValueError(
                f"bloom int probe against {physical_type} column"
            )
        lo, hi = -(1 << (8 * width - 1)), (1 << (8 * width - 1)) - 1
        if not lo <= value <= hi:
            return None  # cannot exist in this column: proven absent
        return value.to_bytes(width, "little", signed=True)
    if isinstance(value, str):
        return value.encode("utf-8")
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    raise ValueError(f"unsupported bloom probe type {type(value).__name__}")


def read_bloom_filter(fetch, offset: int) -> bytes:
    """Fetch and validate one bloom filter: the Thrift-compact
    ``BloomFilterHeader`` (numBytes; algorithm/hash/compression unions
    — only BLOCK / XXHASH / UNCOMPRESSED are in the format today) at
    ``offset``, then the bitset bytes.  ``fetch(off, len)`` is the
    ranged reader (file seek / object-store range GET)."""
    from .parquetfmt import _read_struct

    head = fetch(offset, 64)  # header is a few bytes; over-read is fine
    hdr, pos = _read_struct(head, 0, 0)
    n_bytes = hdr.get(1)
    if not isinstance(n_bytes, int) or n_bytes <= 0:
        raise ValueError("bloom header missing numBytes")
    for fid, what in ((2, "algorithm"), (3, "hash"), (4, "compression")):
        u = hdr.get(fid)
        if not isinstance(u, dict) or list(u.keys()) != [1]:
            raise ValueError(f"bloom header {what} is not the known union")
    bitset = fetch(offset + pos, n_bytes)
    if len(bitset) != n_bytes:
        raise ValueError("bloom bitset truncated")
    return bitset


def bloom_might_contain_file(path: str, column: str, value) -> bool | None:
    """File-level point-lookup skip: True = the column MIGHT contain
    the value (or a row group has no filter — no proof, must scan),
    False = provably absent from EVERY row group.  None when the file
    carries no bloom filter for the column at all."""
    from .parquetfmt import parse_footer_tail, read_footer_tail

    with open(path, "rb") as fh:
        fh.seek(0, 2)
        size = fh.tell()

        def fetch(off, ln):
            fh.seek(off)
            return fh.read(ln)

        meta = parse_footer_tail(read_footer_tail(fetch, size))
        offs = [b for b in meta["bloom_offsets"] if b["col"] == column]
        if not offs:
            return None
        if len(offs) < meta["n_row_groups"]:
            return True  # some chunk lacks a filter: no proof
        try:
            idx = meta["column_names"].index(column)
            ptype = meta["physical_types"][idx]
        except ValueError:
            # cannot resolve the column's physical type (nested
            # path): a GUESSED width could hash wrong and fabricate
            # proof of absence — no proof, must scan
            return True
        if isinstance(value, (str, bytes, bytearray)) and \
                ptype != "BYTE_ARRAY":
            # a text probe against a non-text column: Spark's filter
            # COERCES ('5' matches an int 5), but hashing the text
            # bytes against an int column's filter would fabricate
            # proof of absence — no proof, must scan
            return True
        try:
            encoded = plain_encode(value, ptype)
        except ValueError:
            # unsupported value/physical-type combination (e.g. an int
            # probe against a FLOAT/FIXED_LEN_BYTE_ARRAY column): not
            # proof of absence — pruning must never abort a scan, so
            # keep the file like the stats pruners do (ADVICE r11)
            return True
        if encoded is None:
            return False  # out of the column type's range entirely
        h = xxhash64(encoded)
        for b in offs:
            if sbbf_might_contain(
                read_bloom_filter(fetch, b["offset"]), h
            ):
                return True
        return False


def prune_files_by_bloom(
    table_dir: str,
    live: dict,
    column: str,
    value,
) -> dict:
    """Which live files can a point predicate ``column = value``
    actually touch?  Composes AFTER min/max and partition pruning
    (same never-changes-results contract: files without filters are
    kept).  O(survivors) ranged footer+bitset reads — kilobytes per
    file, no data pages.  Returns the `prune_live_files` shape."""
    import os

    kept: dict[str, tuple[int, int]] = {}
    n_no_filter = 0
    for rel, (size, rows) in live.items():
        res = bloom_might_contain_file(
            os.path.join(table_dir, rel), column, value
        )
        if res is None:
            n_no_filter += 1
            kept[rel] = (size, rows)
        elif res:
            kept[rel] = (size, rows)
    return {
        "kept": dict(sorted(kept.items())),
        "n_kept": len(kept),
        "n_skipped": len(live) - len(kept),
        "n_no_stats": n_no_filter,
        "rows_kept_max": sum(r for _, r in kept.values()),
    }
