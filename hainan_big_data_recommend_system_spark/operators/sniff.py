"""Format sniffing — magic-byte detection over a mixed binary lake.

Real ingestion directories are never one format: a crawl dump mixes
WARC shards with PDF attachments, a vendor drop mixes parquet with
zipped CSV.  The router below identifies ~20 container/media formats
from their magic bytes (all public file-format signatures) and the
catalog query dispatches each payload to the REAL parser this repo
already ships — one scan, per-format record accounting, quarantine for
the unknown.

Detection is prefix-based except TAR (whose ``ustar`` magic sits at
offset 257 — the header block layout) and mbox (a text convention:
the ``From `` envelope).  Detection order puts offset/denser checks
where prefixes cannot collide; every returned name matches the parser
registry in qcatalog's ``format_sniff_scan``.
"""

from __future__ import annotations

_PREFIXES: list[tuple[bytes, str]] = [
    (b"PAR1", "parquet"),
    (b"ORC", "orc"),
    (b"Obj\x01", "avro"),
    (b"WARC/", "warc"),
    (b"PK\x03\x04", "zip"),
    (b"%PDF", "pdf"),
    (b"From ", "mbox"),
    (b"\x1f\x8b", "gzip"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"fLaC", "flac"),
    (b"OggS", "ogg"),
    (b"\x1a\x45\xdf\xa3", "webm"),
    (b"ID3", "mp3"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"BM", "bmp"),
    (b"BZh", "bzip2"),
    (b"\xfd7zXZ\x00", "xz"),
    (b"\x28\xb5\x2f\xfd", "zstd"),
    (b"\x04\x22\x4d\x18", "lz4"),  # lz4 FRAME magic (not raw blocks)
]


def detect_format(payload: bytes) -> str:
    """Magic-byte format name, or ValueError for the quarantine path."""
    if len(payload) >= 262 and payload[257:262] == b"ustar":
        return "tar"
    for magic, name in _PREFIXES:
        if payload.startswith(magic):
            return name
    if payload.startswith(b"RIFF") and len(payload) >= 12:
        kind = payload[8:12]
        if kind == b"WAVE":
            return "wav"
        if kind == b"WEBP":
            return "webp"
        if kind == b"AVI ":
            return "avi"
        raise ValueError(f"unknown RIFF container {kind!r}")
    if len(payload) >= 8 and payload[4:8] == b"ftyp":
        return "mp4"
    raise ValueError("unknown format (no magic matched)")
