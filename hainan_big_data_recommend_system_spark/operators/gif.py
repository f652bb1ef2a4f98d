"""Pure-Python GIF codec (round 6) — LZW-compressed palettized images,
the fourth real image format on the decode ladder (BMP header, PNG
inflate/unfilter, JPEG sequential/progressive entropy decode, now GIF
LZW).  GIF is everywhere in web crawls, and unlike JPEG it is LOSSLESS,
so the decoded pixel stream is fully oracle-predictable.

Scope: GIF87a/GIF89a, global color table, first image frame (an
animated stream decodes its first frame), interlaced or sequential row
order, extensions skipped by sub-block walk.  Everything REAL:

- logical screen descriptor + global color table parse;
- extension blocks (graphic control, comment, application) skipped by
  their length-prefixed sub-block structure;
- LZW decompression: variable-width codes (LSB-first bit packing),
  clear/EOI codes, dictionary growth to 4096 with clear-reset, the
  code==next special case;
- interlace pass reordering (8/8, 8/4+4, 4/2+2, 2/1+1);
- palette mapping to interleaved RGB8.

The fixture encoder (`make_gif`) uses a formula palette
``(i, (3i) mod 256, 255-i)`` with the pixel INDEX stream being the seed
cycled to w*h bytes — so the decoded RGB is a pure function of
(width, height, seed) that oracles and tests recompute independently.

Public knowledge: GIF89a specification (CompuServe 1990); Welch 1984
(LZW).
"""

from __future__ import annotations

import struct


def _palette() -> bytes:
    return bytes(
        b for i in range(256) for b in (i, (3 * i) % 256, 255 - i)
    )


class _LSBWriter:
    """LSB-first bit packer (GIF's LZW bit order — opposite of JPEG)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LSBWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w.write(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        w.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        w.write(table[cur], width)
    w.write(eoi, width)
    return w.flush()


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def make_gif(
    width: int, height: int, pixel_seed: bytes, interlaced: bool = False
) -> bytes:
    """A valid GIF89a whose palette-index stream is ``pixel_seed`` cycled
    to ``width*height`` bytes (256-entry formula palette)."""
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError(f"bad dimensions {width}x{height}")
    seed = pixel_seed or b"\x00"
    n = width * height
    idx = (seed * (-(-n // len(seed))))[:n]
    if interlaced:
        rows = [idx[r * width : (r + 1) * width] for r in range(height)]
        idx = b"".join(rows[r] for r in _interlace_order(height))
    out = bytearray(b"GIF89a")
    # logical screen: GCT flag, 8-bit color resolution, 256-entry table
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += _palette()
    flags = 0x40 if interlaced else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, flags)
    out.append(8)  # LZW minimum code size
    data = _lzw_encode(idx)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream exhausted before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"first LZW code {code} undefined")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table ({len(table)})")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) > expect:
            raise ValueError("LZW output exceeds image size")
    if len(out) != expect:
        raise ValueError(
            f"LZW output {len(out)} pixels != image size {expect}"
        )
    return bytes(out)


def parse_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first frame: ``(width, height, 3, interleaved RGB8)``.
    Raises ValueError on malformed streams (bad signature, missing
    color table, truncated blocks, LZW inconsistencies)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        gct_n = 2 << (packed & 0x07)
        if pos + 3 * gct_n > len(payload):
            raise ValueError("truncated global color table")
        gct = payload[pos : pos + 3 * gct_n]
        pos += 3 * gct_n
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer before any image
            raise ValueError("no image frame before trailer")
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated extension sub-blocks")
                ln = payload[pos]
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block introducer {b:#04x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated image descriptor")
        _left, _top, iw, ih, flags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if iw <= 0 or ih <= 0:
            raise ValueError(f"bad frame dimensions {iw}x{ih}")
        pal = gct
        if flags & 0x80:
            lct_n = 2 << (flags & 0x07)
            if pos + 3 * lct_n > len(payload):
                raise ValueError("truncated local color table")
            pal = payload[pos : pos + 3 * lct_n]
            pos += 3 * lct_n
        if pal is None:
            raise ValueError("frame has neither local nor global color table")
        if pos >= len(payload):
            raise ValueError("missing LZW minimum code size")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"bad LZW minimum code size {mcs}")
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated image sub-blocks")
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            if pos + ln > len(payload):
                raise ValueError("truncated image sub-block")
            data += payload[pos : pos + ln]
            pos += ln
        idx = _lzw_decode(bytes(data), mcs, iw * ih)
        if flags & 0x40:  # interlaced: invert the pass ordering
            rows = [
                idx[r * iw : (r + 1) * iw] for r in range(ih)
            ]
            ordered: list[bytes | None] = [None] * ih
            for src, dst in enumerate(_interlace_order(ih)):
                ordered[dst] = rows[src]
            idx = b"".join(ordered)  # type: ignore[arg-type]
        n_pal = len(pal) // 3
        px = bytearray()
        for i in idx:
            if i >= n_pal:
                raise ValueError(f"palette index {i} >= table size {n_pal}")
            px += pal[3 * i : 3 * i + 3]
        return iw, ih, 3, bytes(px)
    raise ValueError("payload ended before an image frame")
