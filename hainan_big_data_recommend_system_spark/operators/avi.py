"""Pure-Python AVI (RIFF) container codec — the video leg of the
multimodal surface, completing the real-decode triad (images:
BMP/PNG/JPEG pixels; audio: WAV samples; video: an actual container
walk whose frames run through the real JPEG entropy decoder).

``make_avi`` writes a minimal but VALID motion-JPEG AVI: RIFF('AVI ')
holding a LIST('hdrl') with the 56-byte main header and one 'vids'
stream (LIST('strl'): stream header + BITMAPINFOHEADER), then a
LIST('movi') of '00dc' chunks each containing one baseline JPEG frame.
``parse_avi`` walks the chunk tree back — RIFF magic, nested LIST
recursion, word alignment — and returns the header geometry plus the
raw frame payloads.

``avi_features`` is the load-bearing part: it Huffman-decodes EVERY
frame with :mod:`.jpeg` and folds the decoded pixel values.  Fixture
frames are flat grayscale (flat 8×8 blocks are DC-only, which the JPEG
codec reproduces EXACTLY — pinned in tests/test_jpeg.py), so the fold
is an exact integer the DuckDB oracle predicts from the generative
formula without ever seeing a byte: a header-only parse cannot produce
``gray_sum``; only a genuine per-frame entropy decode can.
"""

from __future__ import annotations

import struct

from .jpeg import make_jpeg, parse_jpeg


def _chunk(ctype: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return ctype + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def make_avi(
    frames: list[bytes],
    width: int,
    height: int,
    us_per_frame: int = 40_000,
) -> bytes:
    """A minimal valid MJPG AVI holding ``frames`` (JPEG payloads)."""
    avih = struct.pack(
        "<14I",
        us_per_frame, 0, 0, 0, len(frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    # the real 56-byte AVISTREAMHEADER layout: fcc, handler, flags,
    # prio, lang, initialFrames, scale, rate, start, length, sugBuf,
    # quality, sampleSize, rcFrame(4×int16)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, us_per_frame, 1_000_000, 0,
        len(frames), 0, 0, 0, 0, 0, int(width), int(height),
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, pos: int, end: int, out: dict) -> None:
    # iterative with an explicit range stack: a crafted payload of
    # deeply nested LIST headers must exhaust into a ValueError-class
    # rejection path, never a RecursionError that escapes the
    # corrupt-row contract
    ranges = [(pos, end)]
    while ranges:
        pos, end = ranges.pop()
        while pos + 8 <= end:
            ctype = payload[pos : pos + 4]
            clen = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            if pos + 8 + clen > end:
                raise ValueError(f"truncated {ctype!r} chunk")
            body_start = pos + 8
            next_pos = body_start + clen + (clen & 1)  # word alignment
            if ctype == b"LIST":
                if clen < 4:
                    raise ValueError("LIST chunk too short")
                # resume the current level after the LIST, then descend
                ranges.append((next_pos, end))
                pos, end = body_start + 4, body_start + clen
                continue
            if ctype == b"avih":
                if clen < 56:
                    raise ValueError("avih chunk too short")
                out["avih"] = struct.unpack(
                    "<14I", payload[body_start : body_start + 56]
                )
            elif ctype == b"00dc":
                out.setdefault("frames", []).append(
                    payload[body_start : body_start + clen]
                )
            pos = next_pos


def parse_avi(payload: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """``(us_per_frame, total_frames, width, height, frames)``.

    Raises ``ValueError`` on anything malformed — the corrupt-row
    contract of every decoder in this package."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    riff_len = struct.unpack("<I", payload[4:8])[0]
    end = riff_len + 8
    if end > len(payload):
        raise ValueError("truncated RIFF payload")
    out: dict = {}
    _walk(payload, 12, end, out)
    if "avih" not in out:
        raise ValueError("missing avih header")
    f = out["avih"]
    frames = out.get("frames", [])
    if f[4] != len(frames):
        raise ValueError(
            f"header declares {f[4]} frames, movi holds {len(frames)}"
        )
    return f[0], f[4], f[8], f[9], frames


def avi_features(payload: bytes) -> tuple[int, int, int, int, int]:
    """``(n_frames, us_per_frame, width, height, gray_sum)`` where
    ``gray_sum`` folds the first decoded pixel value of EVERY frame —
    exact for the flat-gray fixture frames, and impossible to produce
    without running the full JPEG entropy decode per frame."""
    us, n, w, h, frames = parse_avi(payload)
    gray_sum = 0
    for fr in frames:
        fw, fh, fc, pix = parse_jpeg(fr)
        if (fw, fh) != (w, h):
            raise ValueError(
                f"frame dims {fw}x{fh} contradict container {w}x{h}"
            )
        gray_sum += pix[0]
    return n, us, w, h, gray_sum


def make_fixture_avi(doc_id: int) -> bytes:
    """The generative fixture: n, dims and per-frame gray are pure
    integer functions of ``doc_id`` (mirrored in the audio/video oracle
    SQL).  Even frames are flat-gray single-component JPEGs; odd frames
    (round 6) are flat-COLOR 4:2:0-subsampled JPEGs — a flat r=g=b block
    has exactly-128 chroma and a DC-only DCT, so under the flat quant
    tables the 4:2:0 roundtrip is bit-exact and the first decoded pixel
    (R) equals the same gray value: the oracle's generative formula is
    unchanged, but decoding odd frames now REQUIRES the generalized
    interleaved-MCU walk (operators/jpeg.py, 4 Y + Cb + Cr per MCU)."""
    n_frames = 2 + doc_id % 3
    width = 16 + (doc_id % 4) * 8
    height = 8 + (doc_id % 3) * 8
    frames = [
        make_jpeg(
            width,
            height,
            bytes([(doc_id * 31 + i * 17) % 256] * 3),
            gray=(i % 2 == 0),
            subsampling="444" if i % 2 == 0 else "420",
        )
        for i in range(n_frames)
    ]
    return make_avi(frames, width, height)
