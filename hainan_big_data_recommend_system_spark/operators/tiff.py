"""Standalone TIFF container walk — multi-page IFD chains + strips.

The EXIF operator (operators/exif.py) walks ONE IFD embedded in a JPEG
APP1 segment; scanned-document corpora ship standalone ``.tif`` files
whose structure is richer in exactly two ways this walk covers:

- the **IFD chain**: each IFD's trailing 4-byte pointer links the next
  page (multi-page scans — the common archival layout); pages walk
  until a zero pointer, with a cycle guard;
- **strip resolution**: image data lives wherever StripOffsets points,
  RowsPerStrip rows per strip, with StripByteCounts the authoritative
  sizes — the walk RESOLVES every strip (bounds-checked against the
  file) and folds its first and last byte into the result, so a wrong
  offset interpretation cannot pass.

Both byte orders (II/MM) are first-class, as in the EXIF walk.  Scope:
uncompressed (Compression=1) 8-bit grayscale — the archival baseline;
compressed TIFFs quarantine loudly via the standard ValueError path.

Public knowledge: TIFF 6.0 specification (Adobe, 1992).
"""

from __future__ import annotations

import struct

_WIDTH, _LENGTH, _BITS, _COMPRESSION = 0x0100, 0x0101, 0x0102, 0x0103
_STRIP_OFFSETS, _ROWS_PER_STRIP, _STRIP_COUNTS = 0x0111, 0x0116, 0x0117


def make_tiff(
    pages: list[tuple[int, int, bytes]],
    little_endian: bool = True,
    rows_per_strip: int = 4,
) -> bytes:
    """Build a real multi-page TIFF: ``pages`` are ``(w, h, pixels)``
    with ``len(pixels) == w*h`` 8-bit gray samples, stripped every
    ``rows_per_strip`` rows."""
    e = "<" if little_endian else ">"
    out = bytearray()
    out += (b"II" if little_endian else b"MM") + struct.pack(f"{e}H", 42)
    out += struct.pack(f"{e}I", 0)  # IFD0 pointer, patched below
    ifd_ptr_pos = 4
    for w, h, pixels in pages:
        if len(pixels) != w * h:
            raise ValueError("pixel buffer does not match w*h")
        strips = []
        for y0 in range(0, h, rows_per_strip):
            rows = min(rows_per_strip, h - y0)
            strips.append(pixels[y0 * w : (y0 + rows) * w])
        strip_offsets = []
        for s in strips:
            strip_offsets.append(len(out))
            out += s
        # offset/count arrays (LONG) when more than one strip
        def _arr(values):
            pos = len(out)
            for v in values:
                out.extend(struct.pack(f"{e}I", v))
            return pos

        off_pos = _arr(strip_offsets) if len(strips) > 1 else strip_offsets[0]
        cnt_pos = (
            _arr([len(s) for s in strips])
            if len(strips) > 1
            else len(strips[0])
        )
        if len(out) % 2:
            out += b"\x00"  # IFDs must be word-aligned
        ifd_pos = len(out)
        struct.pack_into(f"{e}I", out, ifd_ptr_pos, ifd_pos)
        entries = [
            (_WIDTH, 3, 1, w),
            (_LENGTH, 3, 1, h),
            (_BITS, 3, 1, 8),
            (_COMPRESSION, 3, 1, 1),
            (_STRIP_OFFSETS, 4, len(strips), off_pos),
            (_ROWS_PER_STRIP, 3, 1, rows_per_strip),
            (_STRIP_COUNTS, 4, len(strips), cnt_pos),
        ]
        out += struct.pack(f"{e}H", len(entries))
        for tag, typ, count, val in entries:
            out += struct.pack(f"{e}HHI", tag, typ, count)
            if typ == 3:  # SHORT packs into the value slot, left-justified
                out += struct.pack(f"{e}H", val) + b"\x00\x00"
            else:
                out += struct.pack(f"{e}I", val)
        ifd_ptr_pos = len(out)
        out += struct.pack(f"{e}I", 0)  # next-IFD pointer (patched)
    return bytes(out)


def parse_tiff(payload: bytes) -> dict:
    """Walk the IFD chain: ``{endian, n_pages, widths, heights,
    n_strips, pixel_bytes, strip_fold}`` where ``strip_fold`` sums each
    resolved strip's first and last byte — offsets must really resolve.
    Raises ValueError on malformed structure or unsupported layouts."""
    if payload[:2] == b"II":
        e = "<"
    elif payload[:2] == b"MM":
        e = ">"
    else:
        raise ValueError(f"bad TIFF byte-order mark {payload[:2]!r}")
    if len(payload) < 8 or struct.unpack_from(f"{e}H", payload, 2)[0] != 42:
        raise ValueError("bad TIFF magic (not 42)")
    ifd = struct.unpack_from(f"{e}I", payload, 4)[0]
    widths, heights = [], []
    n_strips = pixel_bytes = strip_fold = 0
    seen = set()
    while ifd:
        if ifd in seen:
            raise ValueError("IFD chain cycle")
        seen.add(ifd)
        if ifd + 2 > len(payload):
            raise ValueError("IFD offset out of bounds")
        n = struct.unpack_from(f"{e}H", payload, ifd)[0]
        end = ifd + 2 + 12 * n
        if end + 4 > len(payload):
            raise ValueError("IFD entries run out of bounds")
        tags: dict[int, tuple[int, int, int]] = {}
        for i in range(n):
            off = ifd + 2 + 12 * i
            tag, typ, count = struct.unpack_from(f"{e}HHI", payload, off)
            if typ == 3:
                val = struct.unpack_from(f"{e}H", payload, off + 8)[0]
            else:
                val = struct.unpack_from(f"{e}I", payload, off + 8)[0]
            tags[tag] = (typ, count, val)
        for req in (_WIDTH, _LENGTH, _STRIP_OFFSETS, _STRIP_COUNTS):
            if req not in tags:
                raise ValueError(f"IFD missing required tag {req:#06x}")
        if tags.get(_COMPRESSION, (3, 1, 1))[2] != 1:
            raise ValueError("only uncompressed (Compression=1) in scope")
        if tags.get(_BITS, (3, 1, 8))[2] != 8:
            raise ValueError("only 8-bit samples in scope")
        w, h = tags[_WIDTH][2], tags[_LENGTH][2]

        def _longs(entry) -> list[int]:
            typ, count, val = entry
            if count == 1:
                return [val]
            if val + 4 * count > len(payload):
                raise ValueError("strip array out of bounds")
            return [
                struct.unpack_from(f"{e}I", payload, val + 4 * k)[0]
                for k in range(count)
            ]

        offs = _longs(tags[_STRIP_OFFSETS])
        cnts = _longs(tags[_STRIP_COUNTS])
        if len(offs) != len(cnts):
            raise ValueError("StripOffsets/StripByteCounts disagree")
        if sum(cnts) != w * h:
            raise ValueError(
                f"strip bytes {sum(cnts)} != w*h {w * h} (8-bit gray)"
            )
        for o, c in zip(offs, cnts):
            if c <= 0 or o + c > len(payload):
                raise ValueError(f"strip at {o} out of bounds")
            strip_fold += payload[o] + payload[o + c - 1]
        widths.append(w)
        heights.append(h)
        n_strips += len(offs)
        pixel_bytes += w * h
        ifd = struct.unpack_from(f"{e}I", payload, end)[0]
    if not widths:
        raise ValueError("TIFF has no IFDs")
    return {
        "endian": "II" if e == "<" else "MM",
        "n_pages": len(widths),
        "widths": widths,
        "heights": heights,
        "n_strips": n_strips,
        "pixel_bytes": pixel_bytes,
        "strip_fold": strip_fold,
    }
