"""TAR (ustar) and ZIP archive sources — the other containers corpus
dumps arrive in (datasets ship as ``.tar`` shards, scrapes as ``.zip``).

Both parsers are byte-level and strict (ValueError quarantine):

- TAR: 512-byte ustar headers — octal size fields, the space-substituted
  checksum rule, data rounded to 512-byte blocks, the two-zero-block
  terminator; GNU ``L`` longname entries and PAX ``x`` extended headers
  (``path=``) override the 100-byte name field (round 7 — dataset dumps
  carry deep paths), and non-file entries (directories, links, PAX
  globals) are framed + checksum-verified but skipped as members;
- ZIP: End-Of-Central-Directory located from the tail, central-directory
  walk to each local header (the robust read order — streaming local
  headers breaks on data-descriptor files), STORED and DEFLATE members
  (raw zlib, wbits=-15), CRC-32 verified against the directory entry;
  ZIP64 (round 7): sentinel EOCD → EOCD64 locator/record for the real
  64-bit geometry, 0x0001 extra fields for saturated entry sizes —
  the layout of >4 GiB dumps and of tools that emit it always.

Public knowledge: POSIX.1-1988 ustar + pax(1); GNU tar longname layout;
PKWARE APPNOTE.TXT §4.5 (ZIP64); RFC 1951 (DEFLATE).
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
    """Names over the ustar 100-byte field ride a GNU ``L`` longname
    entry (the layout GNU tar emits), so deep dataset paths roundtrip."""
    out = bytearray()
    for name, data in members:
        nb = name.encode()
        if len(nb) > 100:
            ln = nb + b"\x00"
            hdr = bytearray(_tar_header("././@LongLink", len(ln)))
            hdr[156] = ord("L")
            # retotal the checksum after the typeflag change
            hdr[148:156] = b" " * 8
            hdr[148:156] = f"{sum(hdr):06o}\x00 ".encode()
            out += hdr + ln
            if len(ln) % 512:
                out += bytes(512 - len(ln) % 512)
            name = name[:100]
        out += _tar_header(name, len(data))
        out += data
        if len(data) % 512:
            out += bytes(512 - len(data) % 512)
    out += bytes(1024)  # two zero blocks terminate the archive
    return bytes(out)


def parse_tar(payload: bytes) -> list[tuple[str, bytes]]:
    """Regular-file members of a tar stream.

    Beyond plain ustar (round 7): GNU ``L`` long-name entries and PAX
    ``x`` extended headers (``path=`` keyword) override the next
    member's 100-byte name field — dataset dumps routinely carry deep
    paths; directories / links / PAX globals are skipped as members but
    their blocks are still framed and checksum-verified."""
    members: list[tuple[str, bytes]] = []
    pos = 0
    n = len(payload)
    pending_name: str | None = None
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
        data = payload[pos + 512 : data_end]
        typeflag = header[156:157]
        if typeflag == b"L":  # GNU longname: data IS the next member's name
            pending_name = data.rstrip(b"\x00").decode("utf-8", "replace")
        elif typeflag == b"x":  # PAX extended header: "len key=value\n"
            p = 0
            while p < len(data):
                sp = data.index(b" ", p)
                rec_len = int(data[p:sp])
                # The record must cover its own length digits, the space,
                # and the trailing newline, or `p += rec_len` stalls (a
                # zero/negative length otherwise passes the newline check
                # via the PREVIOUS record's newline and loops forever).
                if rec_len <= sp - p + 1:
                    raise ValueError(
                        f"malformed PAX record (length {rec_len} too short)"
                    )
                rec = data[p + rec_len - 1 : p + rec_len]
                if rec != b"\n":
                    raise ValueError("malformed PAX record (missing newline)")
                key, _, value = data[sp + 1 : p + rec_len - 1].partition(b"=")
                if key == b"path":
                    pending_name = value.decode("utf-8", "replace")
                p += rec_len
        elif typeflag in (b"0", b"\x00"):  # regular file
            members.append((pending_name or name, data))
            pending_name = None
        # directories ('5'), links ('1','2'), PAX globals ('g'), ...:
        # framed and verified above, but not corpus members
        pos = data_end + ((512 - size % 512) % 512)
    raise ValueError("tar archive missing zero-block terminator")


# ---------------------------------------------------------------------------
# ZIP
# ---------------------------------------------------------------------------

def make_zip(
    members: list[tuple[str, bytes]],
    deflate: bool = True,
    zip64: bool = False,
) -> bytes:
    """``zip64=True`` emits the ZIP64 layout tools use for >4 GiB dumps
    (and that some emit unconditionally): 0xFFFFFFFF sentinels in the
    central entries with the real sizes/offset in a 0x0001 extra field,
    plus the EOCD64 record + locator before a sentinel EOCD."""
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
        if zip64:
            extra = struct.pack(
                "<HHQQQ", 0x0001, 24, len(data), len(blob), locs[-1]
            )
            central += struct.pack(
                "<IHHHHHHIIIHHHHHII", 0x02014B50, 45, 45, 0, method, 0, 0,
                crc, 0xFFFFFFFF, 0xFFFFFFFF, len(nb), len(extra), 0, 0, 0,
                0, 0xFFFFFFFF,
            ) + nb + extra
        else:
            central += struct.pack(
                "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, method, 0, 0,
                crc, len(blob), len(data), len(nb), 0, 0, 0, 0, 0, locs[-1],
            ) + nb
    cd_off = len(out)
    out += central
    if zip64:
        eocd64_off = len(out)
        out += struct.pack(
            "<IQHHIIQQQQ", 0x06064B50, 44, 45, 45, 0, 0,
            len(members), len(members), len(central), cd_off,
        )
        out += struct.pack("<IIQI", 0x07064B50, 0, eocd64_off, 1)
        out += struct.pack(
            "<IHHHHIIH", 0x06054B50, 0, 0, 0xFFFF, 0xFFFF,
            0xFFFFFFFF, 0xFFFFFFFF, 0,
        )
    else:
        out += struct.pack(
            "<IHHHHIIH", 0x06054B50, 0, 0, len(members), len(members),
            len(central), cd_off, 0,
        )
    return bytes(out)


def _zip64_extra(extra: bytes, usize: int, csize: int, loff: int):
    """Resolve 0xFFFFFFFF sentinels from the ZIP64 extra field (id
    0x0001): its 8-byte values appear in spec order — uncompressed size,
    compressed size, local-header offset — but ONLY for the fields that
    are saturated in the fixed entry."""
    p = 0
    while p + 4 <= len(extra):
        fid, flen = struct.unpack_from("<HH", extra, p)
        body = extra[p + 4 : p + 4 + flen]
        if fid == 0x0001:
            q = 0

            def read_q(at: int) -> int:
                # struct.error would escape the ValueError-only decoder
                # contract; validate remaining body length ourselves.
                if at + 8 > len(body):
                    raise ValueError("ZIP64 extra field truncated")
                return struct.unpack_from("<Q", body, at)[0]

            if usize == 0xFFFFFFFF:
                usize = read_q(q)
                q += 8
            if csize == 0xFFFFFFFF:
                csize = read_q(q)
                q += 8
            if loff == 0xFFFFFFFF:
                loff = read_q(q)
            return usize, csize, loff
        p += 4 + flen
    raise ValueError("saturated sizes without a ZIP64 extra field")


def parse_zip(payload: bytes) -> list[tuple[str, bytes]]:
    eocd = payload.rfind(b"PK\x05\x06")
    if eocd < 0 or eocd + 22 > len(payload):
        raise ValueError("missing ZIP end-of-central-directory")
    (_, _, _, n_here, n_total, cd_size, cd_off, _) = struct.unpack_from(
        "<IHHHHIIH", payload, eocd
    )
    if (
        n_total == 0xFFFF
        or cd_off == 0xFFFFFFFF
        or cd_size == 0xFFFFFFFF
    ):
        # ZIP64 (round 7 — >4 GiB dumps, and tools that emit it always):
        # the EOCD64 LOCATOR sits immediately before the EOCD and points
        # at the EOCD64 record holding the real 64-bit geometry
        loc = eocd - 20
        if loc < 0 or payload[loc : loc + 4] != b"PK\x06\x07":
            raise ValueError("ZIP64 sentinel EOCD without EOCD64 locator")
        (_, _, eocd64_off, n_disks) = struct.unpack_from(
            "<IIQI", payload, loc
        )
        if n_disks != 1:
            raise ValueError("multi-disk ZIP unsupported")
        if (
            eocd64_off + 56 > len(payload)
            or payload[eocd64_off : eocd64_off + 4] != b"PK\x06\x06"
        ):
            raise ValueError("EOCD64 record out of bounds or missing")
        (_, _, _, _, _, _, n_here, n_total, cd_size, cd_off) = (
            struct.unpack_from("<IQHHIIQQQQ", payload, eocd64_off)
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
        if 0xFFFFFFFF in (usize, csize, loff):
            extra = payload[pos + 46 + nlen : pos + 46 + nlen + elen]
            usize, csize, loff = _zip64_extra(extra, usize, csize, loff)
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
