"""Multi-page TIFF walk (operators/tiff.py): IFD chain, both endians,
strip resolution, and rejection paths.  The composed query is
hash-oracled (`tiff_image_meta`)."""

from __future__ import annotations

import struct

import pytest

from hainan_big_data_recommend_system_spark.operators.tiff import (
    make_tiff,
    parse_tiff,
)


def _page(w, h, seed=0):
    return (w, h, bytes((seed + i) % 251 for i in range(w * h)))


@pytest.mark.parametrize("le", [True, False])
def test_multipage_roundtrip(le):
    m = parse_tiff(make_tiff([_page(8, 6), _page(5, 9, 40)], le))
    assert m["endian"] == ("II" if le else "MM")
    assert m["n_pages"] == 2
    assert m["widths"] == [8, 5] and m["heights"] == [6, 9]
    # strips of 4 rows: ceil(6/4) + ceil(9/4) = 2 + 3
    assert m["n_strips"] == 5
    assert m["pixel_bytes"] == 48 + 45


def test_strip_fold_detects_offset_corruption():
    raw = bytearray(make_tiff([_page(8, 8)]))
    good = parse_tiff(bytes(raw))["strip_fold"]
    raw[8] ^= 0x55  # flip the first strip byte (data starts at 8)
    assert parse_tiff(bytes(raw))["strip_fold"] != good


def test_compressed_and_wrong_bits_rejected():
    raw = bytearray(make_tiff([_page(4, 4)]))
    # find the Compression entry (tag 0x0103) and set value 5 (LZW)
    e = "<"
    ifd = struct.unpack_from(f"{e}I", raw, 4)[0]
    n = struct.unpack_from(f"{e}H", raw, ifd)[0]
    for i in range(n):
        off = ifd + 2 + 12 * i
        tag = struct.unpack_from(f"{e}H", raw, off)[0]
        if tag == 0x0103:
            struct.pack_into(f"{e}H", raw, off + 8, 5)
    with pytest.raises(ValueError, match="uncompressed"):
        parse_tiff(bytes(raw))


def test_cycle_and_bounds_rejected():
    raw = bytearray(make_tiff([_page(4, 4)]))
    e = "<"
    ifd = struct.unpack_from(f"{e}I", raw, 4)[0]
    n = struct.unpack_from(f"{e}H", raw, ifd)[0]
    next_ptr = ifd + 2 + 12 * n
    struct.pack_into(f"{e}I", raw, next_ptr, ifd)  # self-cycle
    with pytest.raises(ValueError, match="cycle"):
        parse_tiff(bytes(raw))
    with pytest.raises(ValueError, match="byte-order"):
        parse_tiff(b"XX" + bytes(10))


def test_strip_mass_must_equal_geometry():
    raw = bytearray(make_tiff([_page(4, 4)]))
    e = "<"
    ifd = struct.unpack_from(f"{e}I", raw, 4)[0]
    n = struct.unpack_from(f"{e}H", raw, ifd)[0]
    for i in range(n):
        off = ifd + 2 + 12 * i
        tag = struct.unpack_from(f"{e}H", raw, off)[0]
        if tag == 0x0100:  # shrink declared width
            struct.pack_into(f"{e}H", raw, off + 8, 3)
    with pytest.raises(ValueError, match="strip bytes"):
        parse_tiff(bytes(raw))
