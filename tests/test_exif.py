"""EXIF embed/parse + orientation normalization (operators/exif.py)."""

from __future__ import annotations

import numpy as np
import pytest

from hainan_big_data_recommend_system_spark.operators.exif import (
    add_exif,
    normalize_orientation,
    parse_exif,
)
from hainan_big_data_recommend_system_spark.operators.jpeg import (
    make_jpeg,
    parse_jpeg,
)


def test_roundtrip_both_byte_orders():
    base = make_jpeg(16, 9, b"exif probe")
    for be in (False, True):
        p = add_exif(base, "CamCo", "Model X", 6, "2024:03:01 10:20:30",
                     big_endian=be)
        assert parse_exif(p) == {
            "make": "CamCo", "model": "Model X", "orientation": 6,
            "datetime": "2024:03:01 10:20:30",
        }
        # pixel decode unaffected by the spliced APP1
        assert parse_jpeg(p) == parse_jpeg(base)
    assert parse_exif(base) is None  # no EXIF -> None, not an error


def test_short_ascii_inlines_in_entry():
    # values <= 4 bytes (incl. NUL) live inside the 12-byte entry
    p = add_exif(make_jpeg(8, 8, b"s"), "abc", "x", 1, "t")
    assert parse_exif(p) == {
        "make": "abc", "model": "x", "orientation": 1, "datetime": "t"
    }


def test_malformed_tiff_raises():
    good = add_exif(make_jpeg(8, 8, b"m"), "A", "B", 1, "T")
    i = good.find(b"Exif\x00\x00") + 6
    bad_bom = good[:i] + b"XX" + good[i + 2:]
    with pytest.raises(ValueError, match="byte-order"):
        parse_exif(bad_bom)
    # orientation outside 1..8
    with pytest.raises(ValueError, match="orientation"):
        add_exif(make_jpeg(8, 8, b"m"), "A", "B", 9, "T")


def test_orientation_normalization_recovers_display_image():
    """For every orientation: store the pre-transformed image + tag,
    normalize after decode, recover the display image exactly (pure
    pixel permutations — no codec loss involved here)."""
    rng = np.random.RandomState(5)
    disp = rng.randint(0, 256, (9, 16, 3), dtype=np.uint8)
    inverse = {
        1: lambda a: a,
        2: lambda a: a[:, ::-1],
        3: lambda a: a[::-1, ::-1],
        4: lambda a: a[::-1],
        5: lambda a: a.transpose(1, 0, 2),
        6: lambda a: np.rot90(a, 1),   # stored = display rotated 90 CCW
        7: lambda a: np.rot90(a, 2).transpose(1, 0, 2),
        8: lambda a: np.rot90(a, 3),
    }
    for o, inv in inverse.items():
        stored = np.ascontiguousarray(inv(disp))
        px, w, h = normalize_orientation(
            stored.tobytes(), stored.shape[1], stored.shape[0], 3, o
        )
        got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
        assert got.shape == disp.shape, o
        assert np.array_equal(got, disp), f"orientation {o}"
