"""Ogg/Opus container walk — pages, lacing, CRC, OpusHead/OpusTags.

Podcast/voice audio in crawls is Ogg-encapsulated Opus.  An Ogg stream
is a sequence of pages: ``OggS`` + version 0 + header-type flags
(0x01 continuation / 0x02 BOS / 0x04 EOS) + 64-bit little-endian
granule position + serial + sequence + CRC + a lacing table (segment
count, then segment sizes; a 255 segment continues the packet, <255
terminates it — packets can span pages via the continuation flag).
The page CRC is the spec's own variant: polynomial 0x04C11DB7,
UNREFLECTED, init 0, xorout 0 — libogg's table, NOT zlib.crc32; the
parser recomputes it over the page with the CRC field zeroed, so a
single flipped payload bit is caught (load-bearing walk, not a header
skim).

The first packet must be ``OpusHead`` (RFC 7845: version, channel
count, 16-bit LE pre-skip, input sample rate, gain); the second,
``OpusTags`` (Vorbis-comment structure, little-endian lengths).
Duration is exact integer math at the 48 kHz granule clock:
``(last_granule - pre_skip) * 1000 // 48000``.

Public knowledge: RFC 3533 (Ogg), RFC 7845 (Opus-in-Ogg), xiph.org
framing docs.
"""

from __future__ import annotations


def _crc_table() -> list[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1)
            r &= 0xFFFFFFFF
        table.append(r)
    return table


_CRC = _crc_table()


def ogg_crc(data: bytes) -> int:
    """The Ogg page checksum: CRC-32/MPEG-2 style (unreflected, init 0,
    xorout 0) per RFC 3533 appendix."""
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC[((r >> 24) & 0xFF) ^ b]
    return r


def _page(header_type: int, granule: int, serial: int, seq: int,
          segments: list[bytes]) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for seg in segments:
        lacing.append(len(seg))
        body += seg
    head = bytearray(b"OggS\x00")
    head.append(header_type)
    head += granule.to_bytes(8, "little", signed=True)
    head += serial.to_bytes(4, "little")
    head += seq.to_bytes(4, "little")
    head += b"\x00\x00\x00\x00"  # CRC placeholder
    head.append(len(lacing))
    head += lacing
    page = bytes(head) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def _lace(packet: bytes) -> list[list[bytes]]:
    """Split a packet into 255-byte lacing segments (with the final
    short segment, possibly empty when the length is a multiple of
    255)."""
    segs = []
    pos = 0
    while True:
        seg = packet[pos:pos + 255]
        segs.append(seg)
        pos += 255
        if len(seg) < 255:
            break
    return [segs]


def make_ogg_opus(
    channels: int,
    pre_skip: int,
    input_rate: int,
    frame_sizes: list[int],
    serial: int = 0x1234,
    comments: list[tuple[str, str]] | None = None,
    span_pages: bool = False,
) -> bytes:
    """An Ogg-Opus stream: BOS page (OpusHead), tags page (OpusTags),
    then one audio page per frame (each frame 960 granule units = 20 ms
    at 48 kHz).  With ``span_pages`` the FIRST audio packet is split
    across two pages via a 255-lacing continuation — the reassembly
    case real streams hit whenever a packet tops 255 bytes."""
    if not 1 <= channels <= 2:
        raise ValueError("fixture supports channel count 1-2")
    head = (
        b"OpusHead" + bytes([1, channels])
        + pre_skip.to_bytes(2, "little")
        + input_rate.to_bytes(4, "little")
        + (0).to_bytes(2, "little")   # output gain
        + bytes([0])                  # mapping family 0
    )
    vendor = b"hainan-spark-fixture"
    tags = b"OpusTags" + len(vendor).to_bytes(4, "little") + vendor
    cs = comments or []
    tags += len(cs).to_bytes(4, "little")
    for k, v in cs:
        c = f"{k}={v}".encode()
        tags += len(c).to_bytes(4, "little") + c

    pages = [_page(0x02, 0, serial, 0, _lace(head)[0])]
    pages.append(_page(0x00, 0, serial, 1, _lace(tags)[0]))
    seq = 2
    granule = 0
    frames = [
        bytes(((i * 41 + k * 7) % 249) for k in range(size))
        for i, size in enumerate(frame_sizes)
    ]
    start = 0
    if span_pages and frames:
        # a cross-page packet needs a genuine 255-lacing continuation,
        # so pad the first frame past 255 bytes and split it: page A
        # carries the unterminated 255-segment (granule -1 per RFC 3533
        # — no packet completes on it), page B the tail with the
        # continuation flag
        first = frames[0]
        if len(first) < 256:
            first += bytes((7 * k + 3) % 250 for k in range(300 - len(first)))
        frames[0] = first
        granule += 960
        pages.append(_page(0x00, -1, serial, seq, [first[:255]]))
        seq += 1
        pages.append(_page(0x01, granule, serial, seq, [first[255:]]))
        seq += 1
        start = 1
    for frame in frames[start:]:
        if len(frame) >= 255:
            raise ValueError("non-spanning fixture frames must be < 255")
        granule += 960
        pages.append(_page(0x00, granule, serial, seq, [frame]))
        seq += 1
    # mark the last page EOS
    last = pages[-1]
    retyped = last[:5] + bytes([last[5] | 0x04]) + last[6:22] \
        + b"\x00\x00\x00\x00" + last[26:]
    pages[-1] = retyped[:22] + ogg_crc(retyped).to_bytes(4, "little") \
        + retyped[26:]
    return b"".join(pages)


def parse_ogg_opus(data: bytes) -> dict:
    """``{channels, pre_skip, input_rate, n_pages, n_packets,
    last_granule, duration_ms, vendor, tags, payload_bytes}`` — full
    page walk with per-page CRC verification and cross-page packet
    reassembly."""
    pos = 0
    n_pages = 0
    packets: list[bytes] = []
    partial = b""
    last_granule = 0
    payload_bytes = 0
    serial = None
    saw_bos = saw_eos = False
    expected_seq = 0
    while pos < len(data):
        if data[pos:pos + 4] != b"OggS":
            raise ValueError(f"lost page sync at offset {pos}")
        if pos + 27 > len(data):
            raise ValueError("truncated page header")
        if data[pos + 4] != 0:
            raise ValueError("unsupported Ogg version")
        htype = data[pos + 5]
        granule = int.from_bytes(data[pos + 6:pos + 14], "little",
                                 signed=True)
        pserial = int.from_bytes(data[pos + 14:pos + 18], "little")
        seq = int.from_bytes(data[pos + 18:pos + 22], "little")
        crc = int.from_bytes(data[pos + 22:pos + 26], "little")
        nsegs = data[pos + 26]
        lace_end = pos + 27 + nsegs
        if lace_end > len(data):
            raise ValueError("truncated lacing table")
        lacing = data[pos + 27:lace_end]
        body_len = sum(lacing)
        page_end = lace_end + body_len
        if page_end > len(data):
            raise ValueError("page body truncated")
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"page CRC mismatch at offset {pos}")
        if serial is None:
            serial = pserial
            if not htype & 0x02:
                raise ValueError("first page is not BOS")
            saw_bos = True
        elif pserial != serial:
            raise ValueError("multiplexed streams not supported")
        if seq != expected_seq:
            raise ValueError(f"page sequence gap at {seq}")
        expected_seq += 1
        if htype & 0x01:
            if not partial:
                raise ValueError("continuation page without open packet")
        elif partial:
            raise ValueError("open packet not continued")
        if htype & 0x04:
            saw_eos = True
        body = data[lace_end:page_end]
        payload_bytes += body_len
        off = 0
        for lv in lacing:
            partial += body[off:off + lv]
            off += lv
            if lv < 255:
                packets.append(partial)
                partial = b""
        if granule >= 0:
            last_granule = granule
        pos = page_end
        n_pages += 1
    if partial:
        raise ValueError("stream ends mid-packet")
    if not saw_bos or not saw_eos:
        raise ValueError("missing BOS or EOS page")
    if len(packets) < 2:
        raise ValueError("missing OpusHead/OpusTags packets")
    head = packets[0]
    if head[:8] != b"OpusHead" or len(head) < 19:
        raise ValueError("first packet is not a valid OpusHead")
    if head[8] != 1:
        raise ValueError("unsupported OpusHead version")
    channels = head[9]
    if channels == 0:
        raise ValueError("zero channel count")
    pre_skip = int.from_bytes(head[10:12], "little")
    input_rate = int.from_bytes(head[12:16], "little")
    tags_pkt = packets[1]
    if tags_pkt[:8] != b"OpusTags":
        raise ValueError("second packet is not OpusTags")
    p = 8
    vlen = int.from_bytes(tags_pkt[p:p + 4], "little")
    p += 4
    if p + vlen + 4 > len(tags_pkt):
        raise ValueError("OpusTags vendor overruns packet")
    try:
        vendor = tags_pkt[p:p + vlen].decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"vendor not utf-8: {e}") from e
    p += vlen
    n = int.from_bytes(tags_pkt[p:p + 4], "little")
    p += 4
    tags = []
    for _ in range(n):
        if p + 4 > len(tags_pkt):
            raise ValueError("OpusTags count overruns packet")
        clen = int.from_bytes(tags_pkt[p:p + 4], "little")
        p += 4
        if p + clen > len(tags_pkt):
            raise ValueError("OpusTags comment overruns packet")
        try:
            c = tags_pkt[p:p + clen].decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(f"comment not utf-8: {e}") from e
        p += clen
        if "=" not in c:
            raise ValueError(f"comment without '=': {c!r}")
        k, _, v = c.partition("=")
        tags.append((k.upper(), v))
    samples = max(last_granule - pre_skip, 0)
    return {
        "channels": channels,
        "pre_skip": pre_skip,
        "input_rate": input_rate,
        "n_pages": n_pages,
        "n_packets": len(packets) - 2,   # audio packets
        "last_granule": last_granule,
        "duration_ms": samples * 1000 // 48000,
        "vendor": vendor,
        "tags": tags,
        "payload_bytes": payload_bytes,
    }
