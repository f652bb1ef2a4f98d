"""WebP (RIFF) image metadata — VP8 lossy, VP8L lossless, VP8X extended.

WebP is the other image format a modern crawl is full of; its geometry
lives in three different encodings depending on variant, all little-
endian inside a RIFF container (fourcc + u32le size + payload, padded
to even):

- ``VP8 `` (lossy): 3-byte frame tag (keyframe bit, version,
  show_frame, 19-bit first-partition size), the start code
  ``9D 01 2A``, then two u16le whose LOW 14 bits are width/height (top
  2 bits are a scaling hint);
- ``VP8L`` (lossless): signature byte ``0x2F`` then a little-endian
  BIT stream: 14 bits width-1, 14 bits height-1, 1 alpha bit, 3-bit
  version (must be 0);
- ``VP8X`` (extended): a flags byte (bit 4 = alpha, bit 1 = anim) and
  24-bit-le canvas width-1 / height-1, followed by the per-frame
  chunks (the canvas fields are authoritative for layout).

The parser walks the RIFF chunk list (honoring the odd-size pad byte),
classifies the variant, and decodes the right geometry encoding; the
fixture maker emits all three variants from formula parameters so an
oracle can predict every field.

Public knowledge: Google's public WebP container/bitstream specs
(developers.google.com/speed/webp) and RFC 9649.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _vp8_payload(width: int, height: int, part_size: int = 100) -> bytes:
    if not (0 < width < 1 << 14 and 0 < height < 1 << 14):
        raise ValueError("VP8 dimensions must fit 14 bits")
    tag = (part_size << 5) | (1 << 4) | (0 << 1) | 0  # show, ver 0, keyframe
    body = tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
    body += struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
    # entropy-coded residue (opaque to a metadata walk)
    body += bytes((i * 37) % 251 for i in range(24))
    return body


def _vp8l_payload(width: int, height: int, alpha: bool) -> bytes:
    if not (0 < width <= 1 << 14 and 0 < height <= 1 << 14):
        raise ValueError("VP8L dimensions must fit 14 bits")
    bits = (width - 1) | ((height - 1) << 14) | (int(alpha) << 28)
    # 3-bit version 0 occupies bits 29-31
    return b"\x2f" + bits.to_bytes(4, "little") + bytes(
        (i * 29) % 251 for i in range(16)
    )


def make_webp(
    variant: str, width: int, height: int, alpha: bool = False
) -> bytes:
    """``variant`` in {'vp8', 'vp8l', 'vp8x'}; vp8x wraps a VP8 frame
    with an extended header carrying the canvas geometry (and an ALPH
    chunk when ``alpha``)."""
    if variant == "vp8":
        chunks = _chunk(b"VP8 ", _vp8_payload(width, height))
    elif variant == "vp8l":
        chunks = _chunk(b"VP8L", _vp8l_payload(width, height, alpha))
    elif variant == "vp8x":
        if not (0 < width <= 1 << 24 and 0 < height <= 1 << 24):
            raise ValueError("VP8X canvas must fit 24 bits")
        flags = (0x10 if alpha else 0)
        head = bytes([flags, 0, 0, 0])
        head += (width - 1).to_bytes(3, "little")
        head += (height - 1).to_bytes(3, "little")
        chunks = _chunk(b"VP8X", head)
        if alpha:
            chunks += _chunk(b"ALPH", b"\x00" + bytes(7))  # odd: pads
        chunks += _chunk(b"VP8 ", _vp8_payload(min(width, 0x3FFF),
                                               min(height, 0x3FFF)))
    else:
        raise ValueError(f"unknown variant {variant!r}")
    payload = b"WEBP" + chunks
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def parse_webp(data: bytes) -> dict:
    """``{variant, width, height, has_alpha, is_animated, n_chunks,
    riff_size}`` — geometry from the variant's own encoding (canvas
    fields for VP8X)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP magic missing)")
    if len(data) < 12:
        raise ValueError("truncated RIFF header")
    riff_size = struct.unpack("<I", data[4:8])[0]
    if 8 + riff_size > len(data):
        raise ValueError("RIFF size overruns buffer")
    end = 8 + riff_size
    pos = 12
    variant = None
    width = height = None
    has_alpha = is_animated = False
    n_chunks = 0
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated chunk header at {pos}")
        fourcc = data[pos:pos + 8][:4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if pos + 8 + size > end:
            raise ValueError(f"chunk {fourcc!r} overruns RIFF payload")
        n_chunks += 1
        if fourcc == b"VP8X":
            if size < 10:
                raise ValueError("VP8X header too short")
            variant = "vp8x"
            has_alpha = bool(body[0] & 0x10)
            is_animated = bool(body[0] & 0x02)
            width = int.from_bytes(body[4:7], "little") + 1
            height = int.from_bytes(body[7:10], "little") + 1
        elif fourcc == b"VP8 " and variant is None:
            if size < 10:
                raise ValueError("VP8 frame header too short")
            tag = int.from_bytes(body[0:3], "little")
            if tag & 1:
                raise ValueError("VP8 frame is not a keyframe")
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("VP8 start code missing")
            variant = "vp8"
            width = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            height = struct.unpack("<H", body[8:10])[0] & 0x3FFF
        elif fourcc == b"VP8L" and variant is None:
            if size < 5:
                raise ValueError("VP8L header too short")
            if body[0] != 0x2F:
                raise ValueError("VP8L signature byte missing")
            bits = int.from_bytes(body[1:5], "little")
            if (bits >> 29) & 0x7:
                raise ValueError("VP8L version must be 0")
            variant = "vp8l"
            width = (bits & 0x3FFF) + 1
            height = ((bits >> 14) & 0x3FFF) + 1
            has_alpha = bool((bits >> 28) & 1)
        elif fourcc == b"ALPH":
            has_alpha = True
        pos += 8 + size + (size % 2)  # odd chunks carry a pad byte
    if variant is None or width is None:
        raise ValueError("no VP8/VP8L/VP8X image chunk found")
    if width == 0 or height == 0:
        raise ValueError("zero image dimension")
    return {
        "variant": variant,
        "width": width,
        "height": height,
        "has_alpha": has_alpha,
        "is_animated": is_animated,
        "n_chunks": n_chunks,
        "riff_size": riff_size,
    }
