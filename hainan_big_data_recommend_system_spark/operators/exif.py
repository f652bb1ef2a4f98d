"""EXIF (APP1/TIFF) metadata embed + parse for JPEG payloads.

Real crawl images carry camera metadata in an APP1 segment: an
``Exif\\0\\0`` header followed by a little TIFF file — byte-order mark
(``II``/``MM``), magic 42, and a chain of IFDs whose 12-byte entries
hold typed tag values (inline when they fit 4 bytes, by offset
otherwise).  A corpus pipeline reads at minimum the orientation (to
normalize pixels before hashing — a rotated duplicate must near-dup
match), the capture timestamp, and the device strings (dedup/source
statistics).

Both directions here are REAL and byte-order-general:

- :func:`add_exif` splices a well-formed APP1 into an existing JFIF
  payload (after APP0), little- or big-endian, with out-of-line ASCII
  values at correct offsets;
- :func:`parse_exif` walks the marker stream to APP1, validates the
  TIFF header, and decodes IFD0 entries for Make / Model / Orientation
  / DateTime in WHATEVER byte order the file declares — offsets are
  bounds-checked and malformed streams raise ValueError (quarantine
  contract, same as every decoder in this repo).

Public knowledge: EXIF 2.32 / TIFF 6.0 specifications; JEITA CP-3451.
"""

from __future__ import annotations

import struct

_TAGS = {0x010F: "make", 0x0110: "model", 0x0112: "orientation",
         0x0132: "datetime"}


def add_exif(
    payload: bytes,
    make: str,
    model: str,
    orientation: int,
    datetime_str: str,
    big_endian: bool = False,
) -> bytes:
    """Return ``payload`` with an APP1 EXIF segment spliced in after the
    APP0 segment (or right after SOI if none)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation {orientation} outside EXIF 1..8")
    e = ">" if big_endian else "<"
    bom = b"MM" if big_endian else b"II"

    def ifd_ascii(s: str) -> bytes:
        return s.encode("ascii") + b"\x00"

    make_b, model_b, dt_b = ifd_ascii(make), ifd_ascii(model), ifd_ascii(
        datetime_str
    )
    # IFD0 at offset 8 (right after header): 4 entries, then value area
    n_entries = 4
    ifd_size = 2 + n_entries * 12 + 4
    val_off = 8 + ifd_size  # first out-of-line value offset
    entries = []
    offs = val_off

    def entry(tag: int, typ: int, count: int, value_bytes: bytes) -> bytes:
        nonlocal offs
        if len(value_bytes) <= 4:
            return struct.pack(
                f"{e}HHI", tag, typ, count
            ) + value_bytes.ljust(4, b"\x00")
        out = struct.pack(f"{e}HHII", tag, typ, count, offs)
        tail.append(value_bytes)
        offs += len(value_bytes)
        return out

    tail: list[bytes] = []
    entries.append(entry(0x010F, 2, len(make_b), make_b))
    entries.append(entry(0x0110, 2, len(model_b), model_b))
    entries.append(
        entry(0x0112, 3, 1, struct.pack(f"{e}H", orientation))
    )
    entries.append(entry(0x0132, 2, len(dt_b), dt_b))
    tiff = (
        bom
        + struct.pack(f"{e}H", 42)
        + struct.pack(f"{e}I", 8)
        + struct.pack(f"{e}H", n_entries)
        + b"".join(entries)
        + struct.pack(f"{e}I", 0)  # no next IFD
        + b"".join(tail)
    )
    app1_body = b"Exif\x00\x00" + tiff
    app1 = struct.pack(">BBH", 0xFF, 0xE1, len(app1_body) + 2) + app1_body
    # splice after APP0 if present, else right after SOI
    pos = 2
    if payload[2:4] == b"\xff\xe0":
        seglen = struct.unpack_from(">H", payload, 4)[0]
        pos = 4 + seglen
    return payload[:pos] + app1 + payload[pos:]


def parse_exif(payload: bytes) -> dict | None:
    """Decode IFD0's Make/Model/Orientation/DateTime from the first APP1
    EXIF segment; ``None`` when the JPEG has no EXIF.  Raises ValueError
    on malformed TIFF structure (bad BOM/magic, offsets out of bounds,
    truncated entries)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    tiff = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if marker == 0xDA:  # entropy follows; EXIF must precede SOS
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        if seglen < 2 or pos + 2 + seglen > len(payload):
            raise ValueError(f"bad segment length {seglen} at offset {pos}")
        if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = payload[pos + 10 : pos + 2 + seglen]
            break
        pos += 2 + seglen
    if tiff is None:
        return None
    if len(tiff) < 8:
        raise ValueError("truncated TIFF header in APP1")
    if tiff[:2] == b"II":
        e = "<"
    elif tiff[:2] == b"MM":
        e = ">"
    else:
        raise ValueError(f"bad TIFF byte-order mark {tiff[:2]!r}")
    if struct.unpack_from(f"{e}H", tiff, 2)[0] != 42:
        raise ValueError("bad TIFF magic (not 42)")
    ifd = struct.unpack_from(f"{e}I", tiff, 4)[0]
    if ifd + 2 > len(tiff):
        raise ValueError("IFD0 offset out of bounds")
    n = struct.unpack_from(f"{e}H", tiff, ifd)[0]
    if ifd + 2 + 12 * n + 4 > len(tiff):
        raise ValueError("IFD0 entries run out of bounds")
    out: dict = {}
    for i in range(n):
        off = ifd + 2 + 12 * i
        tag, typ, count = struct.unpack_from(f"{e}HHI", tiff, off)
        name = _TAGS.get(tag)
        if name is None:
            continue
        if typ == 2:  # ASCII
            if count <= 4:
                raw = tiff[off + 8 : off + 8 + count]
            else:
                voff = struct.unpack_from(f"{e}I", tiff, off + 8)[0]
                if voff + count > len(tiff):
                    raise ValueError(f"tag {tag:#06x} value out of bounds")
                raw = tiff[voff : voff + count]
            out[name] = raw.split(b"\x00")[0].decode("ascii", "replace")
        elif typ == 3 and count == 1:  # SHORT
            out[name] = struct.unpack_from(f"{e}H", tiff, off + 8)[0]
    if "orientation" in out and not 1 <= out["orientation"] <= 8:
        raise ValueError(f"orientation {out['orientation']} outside EXIF 1..8")
    return out


def normalize_orientation(pixels: bytes, w: int, h: int, c: int,
                          orientation: int):
    """Apply the EXIF orientation to decoded pixels so every image is in
    display orientation before hashing — a rotated re-upload must
    near-dup match its original, which raw-pixel dHash cannot give.
    Returns ``(pixels, w, h)`` after the transform (dims swap for the
    transposed orientations 5-8)."""
    import numpy as np

    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation {orientation} outside EXIF 1..8")
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, c)
    if orientation == 2:
        a = a[:, ::-1]
    elif orientation == 3:
        a = a[::-1, ::-1]
    elif orientation == 4:
        a = a[::-1]
    elif orientation == 5:
        a = a.transpose(1, 0, 2)
    elif orientation == 6:
        a = np.rot90(a, 3)  # stored needs 90 deg CW to display
    elif orientation == 7:
        a = np.rot90(a.transpose(1, 0, 2), 2)
    elif orientation == 8:
        a = np.rot90(a, 1)
    out = np.ascontiguousarray(a)
    return out.tobytes(), out.shape[1], out.shape[0]
