"""TAR (ustar) and ZIP archive sources — the other containers corpus
dumps arrive in (datasets ship as ``.tar`` shards, scrapes as ``.zip``).

Both parsers are byte-level and strict (ValueError quarantine):

- TAR: 512-byte ustar headers — octal size fields, the space-substituted
  checksum rule, data rounded to 512-byte blocks, the two-zero-block
  terminator;
- ZIP: End-Of-Central-Directory located from the tail, central-directory
  walk to each local header (the robust read order — streaming local
  headers breaks on data-descriptor files), STORED and DEFLATE members
  (raw zlib, wbits=-15), CRC-32 verified against the directory entry.

Public knowledge: POSIX.1-1988 ustar; PKWARE APPNOTE.TXT (ZIP); RFC 1951
(DEFLATE).
"""

from __future__ import annotations

import struct
import zlib


# ---------------------------------------------------------------------------
# TAR (ustar)
# ---------------------------------------------------------------------------

def _tar_header(name: str, size: int) -> bytes:
    if len(name.encode()) > 100:
        raise ValueError("tar member name exceeds 100 bytes")
    h = bytearray(512)
    h[0:100] = name.encode().ljust(100, b"\x00")
    h[100:108] = b"0000644\x00"
    h[108:116] = b"0000000\x00"
    h[116:124] = b"0000000\x00"
    h[124:136] = f"{size:011o}\x00".encode()
    h[136:148] = f"{0:011o}\x00".encode()
    h[148:156] = b" " * 8  # checksum computed over spaces
    h[156] = ord("0")  # regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chksum = sum(h)
    h[148:156] = f"{chksum:06o}\x00 ".encode()
    return bytes(h)


def make_tar(members: list[tuple[str, bytes]]) -> bytes:
    out = bytearray()
    for name, data in members:
        out += _tar_header(name, len(data))
        out += data
        if len(data) % 512:
            out += bytes(512 - len(data) % 512)
    out += bytes(1024)  # two zero blocks terminate the archive
    return bytes(out)


def parse_tar(payload: bytes) -> list[tuple[str, bytes]]:
    members: list[tuple[str, bytes]] = []
    pos = 0
    n = len(payload)
    while pos + 512 <= n:
        header = payload[pos : pos + 512]
        if header == bytes(512):  # first zero block: end of archive
            return members
        if header[257:262] != b"ustar":
            raise ValueError(f"bad ustar magic at offset {pos}")
        stored = header[148:156]
        expect = sum(header[:148]) + 8 * 0x20 + sum(header[156:])
        try:
            got = int(stored.rstrip(b"\x00 ").lstrip() or b"0", 8)
        except ValueError as e:
            raise ValueError("non-octal tar checksum") from e
        if got != expect:
            raise ValueError(
                f"tar header checksum {got:o} != computed {expect:o}"
            )
        name = header[0:100].rstrip(b"\x00").decode("utf-8", "replace")
        try:
            size = int(header[124:136].rstrip(b"\x00 ").lstrip() or b"0", 8)
        except ValueError as e:
            raise ValueError("non-octal tar size field") from e
        data_end = pos + 512 + size
        if data_end > n:
            raise ValueError(f"tar member {name!r} payload truncated")
        members.append((name, payload[pos + 512 : data_end]))
        pos = data_end + ((512 - size % 512) % 512)
    raise ValueError("tar archive missing zero-block terminator")


# ---------------------------------------------------------------------------
# ZIP
# ---------------------------------------------------------------------------

def make_zip(members: list[tuple[str, bytes]], deflate: bool = True) -> bytes:
    locs: list[int] = []
    out = bytearray()
    central = bytearray()
    for name, data in members:
        nb = name.encode()
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if deflate:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            blob = co.compress(data) + co.flush()
            method = 8
        else:
            blob = data
            method = 0
        locs.append(len(out))
        out += struct.pack(
            "<IHHHHHIIIHH", 0x04034B50, 20, 0, method, 0, 0, crc,
            len(blob), len(data), len(nb), 0,
        ) + nb + blob
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, method, 0, 0,
            crc, len(blob), len(data), len(nb), 0, 0, 0, 0, 0, locs[-1],
        ) + nb
    cd_off = len(out)
    out += central
    out += struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, len(members), len(members),
        len(central), cd_off, 0,
    )
    return bytes(out)


def parse_zip(payload: bytes) -> list[tuple[str, bytes]]:
    eocd = payload.rfind(b"PK\x05\x06")
    if eocd < 0 or eocd + 22 > len(payload):
        raise ValueError("missing ZIP end-of-central-directory")
    (_, _, _, n_here, n_total, cd_size, cd_off, _) = struct.unpack_from(
        "<IHHHHIIH", payload, eocd
    )
    if n_here != n_total:
        raise ValueError("multi-disk ZIP unsupported")
    if cd_off + cd_size > len(payload):
        raise ValueError("central directory out of bounds")
    members: list[tuple[str, bytes]] = []
    pos = cd_off
    for _ in range(n_total):
        if payload[pos : pos + 4] != b"PK\x01\x02":
            raise ValueError(f"bad central-directory signature at {pos}")
        (_, _, _, _, method, _, _, crc, csize, usize, nlen, elen, clen,
         _, _, _, loff) = struct.unpack_from("<IHHHHHHIIIHHHHHII", payload, pos)
        name = payload[pos + 46 : pos + 46 + nlen].decode("utf-8", "replace")
        pos += 46 + nlen + elen + clen
        if payload[loff : loff + 4] != b"PK\x03\x04":
            raise ValueError(f"bad local header for {name!r}")
        lnlen, lelen = struct.unpack_from("<HH", payload, loff + 26)
        dstart = loff + 30 + lnlen + lelen
        if dstart + csize > len(payload):
            raise ValueError(f"member {name!r} data out of bounds")
        blob = payload[dstart : dstart + csize]
        if method == 0:
            data = blob
        elif method == 8:
            try:
                data = zlib.decompress(blob, -15)
            except zlib.error as e:
                raise ValueError(f"bad deflate stream in {name!r}: {e}") from e
        else:
            raise ValueError(f"unsupported compression method {method}")
        if len(data) != usize:
            raise ValueError(f"member {name!r} size mismatch")
        if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"member {name!r} CRC mismatch")
        members.append((name, data))
    return members
