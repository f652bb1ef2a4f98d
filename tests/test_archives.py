"""TAR/ZIP sources (sources/archives.py): roundtrips, checksum and CRC
enforcement, malformed rejection.  archive_corpus_scan is oracle-gated
in test_oracle."""

from __future__ import annotations

import struct
import zlib

import pytest

from hainan_big_data_recommend_system_spark.sources.archives import (
    make_tar,
    make_zip,
    parse_tar,
    parse_zip,
)

MEMBERS = [
    ("docs/1.txt", b"hello archive world"),
    ("meta/1.json", b'{"k": 1}'),
    ("big.bin", bytes(range(256)) * 5),  # exercises 512-block rounding
]


def test_tar_roundtrip_and_checksum_enforced():
    t = make_tar(MEMBERS)
    assert parse_tar(t) == MEMBERS
    bad = bytearray(t)
    bad[0] ^= 0xFF  # flip a name byte -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(bad))
    with pytest.raises(ValueError, match="terminator"):
        parse_tar(t[:-1024])  # strip the two zero blocks
    with pytest.raises(ValueError, match="truncated"):
        parse_tar(t[: 512 + 4])  # header promises data that is not there


def test_zip_roundtrip_both_methods_and_crc_enforced():
    for deflate in (False, True):
        z = make_zip(MEMBERS, deflate=deflate)
        assert parse_zip(z) == MEMBERS
    z = bytearray(make_zip(MEMBERS, deflate=False))
    # corrupt one stored byte of the first member's data -> CRC mismatch
    start = z.find(b"hello archive")
    z[start] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_zip(bytes(z))
    with pytest.raises(ValueError, match="end-of-central"):
        parse_zip(make_zip(MEMBERS)[:-23])


def test_zip_reads_via_central_directory():
    """A stray PK\\x03\\x04 in member DATA must not confuse the parser —
    members resolve through the central directory offsets."""
    tricky = [("trap.bin", b"xx" + b"PK\x03\x04" + b"yy")]
    assert parse_zip(make_zip(tricky)) == tricky


def test_empty_archives():
    assert parse_tar(make_tar([])) == []
    assert parse_zip(make_zip([])) == []
