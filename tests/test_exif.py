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


def test_orientation_normalized_phash_matches_original():
    """The dedup-ladder payoff: a rotated re-upload tagged with its EXIF
    orientation hashes IDENTICALLY to the original after normalization
    (pure pixel permutation — dHash/aHash over the same display image),
    while the raw rotated pixels do not."""
    import numpy as np

    from hainan_big_data_recommend_system_spark.operators.phash import (
        ahash64,
        dhash64,
    )

    rng = np.random.RandomState(11)
    disp = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    base_d = dhash64(disp.tobytes(), 32, 24, 3)
    base_a = ahash64(disp.tobytes(), 32, 24, 3)
    stored = np.ascontiguousarray(np.rot90(disp, 1))  # needs orientation 6
    raw_d = dhash64(stored.tobytes(), stored.shape[1], stored.shape[0], 3)
    assert raw_d != base_d  # un-normalized rotation breaks the hash
    px, w, h = normalize_orientation(
        stored.tobytes(), stored.shape[1], stored.shape[0], 3, 6
    )
    assert (w, h) == (32, 24)
    assert dhash64(px, w, h, 3) == base_d
    assert ahash64(px, w, h, 3) == base_a
