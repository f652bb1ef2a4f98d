"""FLAC metadata-block walk — STREAMINFO + Vorbis comments.

Lossless audio in crawls is FLAC; its metadata prefix is
``fLaC`` + a chain of blocks, each headed by one byte (bit 7 =
last-block flag, bits 0-6 = type) and a 24-bit big-endian length.
STREAMINFO (type 0, exactly 34 bytes) packs, in BIG-endian bit order:
min/max block size (16+16), min/max frame size (24+24), sample rate
(20 bits), channels-1 (3), bits-per-sample-1 (5), total samples (36),
then the 16-byte MD5 of the decoded audio.  VORBIS_COMMENT (type 4)
switches to LITTLE-endian length prefixes (it is a Vorbis structure
embedded in a big-endian container — the classic real-world trap):
vendor string, then N ``KEY=value`` comments.

The parser walks the chain strictly (exact STREAMINFO size, no blocks
after the last-flag, bounds on every length), unpacks the bit fields
with integer shifts, and reports tag keys in stream order.  Duration is
exact integer math: ``total_samples * 1000 // sample_rate``.

Public knowledge: the FLAC format spec (xiph.org / RFC 9639) and the
Vorbis-comment spec (xiph.org).
"""

from __future__ import annotations

_STREAMINFO, _PADDING, _VORBIS_COMMENT = 0, 1, 4


def make_flac(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    md5: bytes = b"\x00" * 16,
    comments: list[tuple[str, str]] | None = None,
    padding: int = 0,
    min_block: int = 4096,
    max_block: int = 4096,
    min_frame: int = 1000,
    max_frame: int = 5000,
) -> bytes:
    """Serialize a FLAC metadata prefix (no audio frames — the walk
    under test stops at the last metadata block)."""
    if not 1 <= channels <= 8 or not 4 <= bits_per_sample <= 32:
        raise ValueError("channels 1-8, bits 4-32")
    if sample_rate <= 0 or sample_rate >= 1 << 20:
        raise ValueError("sample rate must fit 20 bits and be positive")
    if total_samples >= 1 << 36:
        raise ValueError("total samples must fit 36 bits")
    if len(md5) != 16:
        raise ValueError("md5 must be 16 bytes")
    packed = (
        (min_block << 256)
        | (max_block << 240)
        | (min_frame << 216)
        | (max_frame << 192)
        | (sample_rate << 172)
        | ((channels - 1) << 169)
        | ((bits_per_sample - 1) << 164)
        | (total_samples << 128)
        | int.from_bytes(md5, "big")
    )
    streaminfo = packed.to_bytes(34, "big")
    blocks: list[tuple[int, bytes]] = [(_STREAMINFO, streaminfo)]
    if comments is not None:
        vendor = b"hainan-spark-fixture"
        body = len(vendor).to_bytes(4, "little") + vendor
        body += len(comments).to_bytes(4, "little")
        for k, v in comments:
            c = f"{k}={v}".encode()
            body += len(c).to_bytes(4, "little") + c
        blocks.append((_VORBIS_COMMENT, body))
    if padding:
        blocks.append((_PADDING, b"\x00" * padding))
    out = bytearray(b"fLaC")
    for i, (btype, body) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out += bytes([last | btype]) + len(body).to_bytes(3, "big") + body
    return bytes(out)


def parse_flac(data: bytes) -> dict:
    """``{sample_rate, channels, bits_per_sample, total_samples,
    duration_ms, md5_hex, n_blocks, padding_bytes, vendor, tags}`` from
    the metadata-block chain.  Raises ValueError on any malformation."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos, n_blocks, saw_last = 4, 0, False
    info = None
    padding_bytes = 0
    vendor: str | None = None
    tags: list[tuple[str, str]] = []
    while not saw_last:
        if pos + 4 > len(data):
            raise ValueError(f"truncated block header at offset {pos}")
        head = data[pos]
        saw_last = bool(head & 0x80)
        btype = head & 0x7F
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body_start = pos + 4
        if body_start + length > len(data):
            raise ValueError(f"block at {pos} overruns stream")
        body = data[body_start:body_start + length]
        if n_blocks == 0 and btype != _STREAMINFO:
            raise ValueError("first block must be STREAMINFO")
        if btype == _STREAMINFO:
            if info is not None:
                raise ValueError("duplicate STREAMINFO block")
            if length != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, {length}")
            packed = int.from_bytes(body, "big")
            sample_rate = (packed >> 172) & ((1 << 20) - 1)
            if sample_rate == 0:
                raise ValueError("zero sample rate")
            info = {
                "min_block": (packed >> 256) & 0xFFFF,
                "max_block": (packed >> 240) & 0xFFFF,
                "min_frame": (packed >> 216) & 0xFFFFFF,
                "max_frame": (packed >> 192) & 0xFFFFFF,
                "sample_rate": sample_rate,
                "channels": ((packed >> 169) & 0x7) + 1,
                "bits_per_sample": ((packed >> 164) & 0x1F) + 1,
                "total_samples": (packed >> 128) & ((1 << 36) - 1),
                "md5_hex": body[18:34].hex(),
            }
        elif btype == _PADDING:
            padding_bytes += length
        elif btype == _VORBIS_COMMENT:
            # LITTLE-endian lengths inside a big-endian container
            p = 0
            if p + 4 > length:
                raise ValueError("vorbis comment vendor length truncated")
            vlen = int.from_bytes(body[p:p + 4], "little")
            p += 4
            if p + vlen + 4 > length:
                raise ValueError("vorbis comment vendor truncated")
            try:
                vendor = body[p:p + vlen].decode("utf-8")
            except UnicodeDecodeError as e:
                raise ValueError(f"vendor not utf-8: {e}") from e
            p += vlen
            n = int.from_bytes(body[p:p + 4], "little")
            p += 4
            for _ in range(n):
                if p + 4 > length:
                    raise ValueError("vorbis comment count overruns block")
                clen = int.from_bytes(body[p:p + 4], "little")
                p += 4
                if p + clen > length:
                    raise ValueError("vorbis comment overruns block")
                try:
                    c = body[p:p + clen].decode("utf-8")
                except UnicodeDecodeError as e:
                    raise ValueError(f"comment not utf-8: {e}") from e
                p += clen
                if "=" not in c:
                    raise ValueError(f"comment without '=': {c!r}")
                k, _, v = c.partition("=")
                tags.append((k.upper(), v))
        n_blocks += 1
        pos = body_start + length
    if info is None:
        raise ValueError("no STREAMINFO block")
    return {
        **info,
        "duration_ms": info["total_samples"] * 1000 // info["sample_rate"],
        "n_blocks": n_blocks,
        "padding_bytes": padding_bytes,
        "vendor": vendor,
        "tags": tags,
    }
