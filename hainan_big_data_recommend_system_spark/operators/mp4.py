"""MP4 / ISO-BMFF (ISO/IEC 14496-12) box-tree metadata walk.

In-the-wild video is overwhelmingly MP4, not AVI: a corpus pipeline's
video leg must read the ISO base-media box tree — ``ftyp`` +
``moov(mvhd, trak(tkhd, mdia(mdhd, hdlr, minf(stbl(stsd, stts, stsc,
stsz, stco/co64)))))`` + ``mdat`` — to get duration, track layout,
codec fourccs, frame geometry, and sample statistics without a codec
decode.  Every box is ``[size:4][type:4][payload]`` with two
real-world size escapes the parser must honor: ``size == 1`` switches
to a 64-bit ``largesize`` (files > 4 GiB) and ``size == 0`` means
"to end of file" (live captures).  Versioned full boxes (mvhd/mdhd/
tkhd) switch their time fields between 32-bit (v0) and 64-bit (v1).

The walk is LOAD-BEARING, not header-only: each track's sample table
is resolved to absolute byte ranges (stco/co64 chunk offset + running
stsz sizes, one chunk per track in the fixture muxer) and the first
byte of every video sample is read from ``mdat`` and folded into an
exact integer — wrong moov arithmetic (version widths, largesize,
sample-entry offsets) lands the reads in the wrong bytes and breaks
the fold.  The sum of all stsz sizes is also cross-checked against the
actual ``mdat`` payload length.

Fixture muxer: spec-shaped streams with formula-chosen fields (fps,
frame count, geometry, codec fourcc, optional AAC-shaped audio track,
v0/stco vs v1/co64 layouts) so an independent oracle can predict every
output from the generative formula alone.

Public knowledge: ISO/IEC 14496-12 (box structure is fully documented
in the public standard and countless open parsers, e.g. mp4box/ffmpeg
docs).
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _box(btype: bytes, payload: bytes, largesize: bool = False) -> bytes:
    """Serialize one box; ``largesize`` forces the 64-bit size escape."""
    if largesize:
        return struct.pack(">I4sQ", 1, btype, 16 + len(payload)) + payload
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(version: int) -> bytes:
    return bytes([version, 0, 0, 0])


def _mvhd(version: int, timescale: int, duration: int) -> bytes:
    if version == 1:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration)
    # rate, volume+reserved, reserved, matrix, pre_defined, next_track_id
    body += struct.pack(">iHHII", 0x00010000, 0x0100, 0, 0, 0)
    body += struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                        0x40000000)
    body += b"\x00" * 24 + struct.pack(">I", 0xFFFFFFFF)
    return _box(b"mvhd", _full(version) + body)


def _tkhd(version: int, track_id: int, duration: int, w: int, h: int) -> bytes:
    if version == 1:
        body = struct.pack(">QQIIQ", 0, 0, track_id, 0, duration)
    else:
        body = struct.pack(">IIIII", 0, 0, track_id, 0, duration)
    body += struct.pack(">IIHHHH", 0, 0, 0, 0, 0x0100, 0)
    body += struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                        0x40000000)
    body += struct.pack(">II", w << 16, h << 16)  # 16.16 fixed point
    return _box(b"tkhd", _full(version) + body)


def _mdhd(version: int, timescale: int, duration: int) -> bytes:
    if version == 1:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">HH", 0x55C4, 0)  # language 'und', pre_defined
    return _box(b"mdhd", _full(version) + body)


def _hdlr(handler: bytes) -> bytes:
    return _box(b"hdlr", _full(0) + struct.pack(">I4sIII", 0, handler, 0, 0, 0)
                + b"h\x00")


def _visual_entry(fourcc: bytes, w: int, h: int) -> bytes:
    body = b"\x00" * 6 + struct.pack(">H", 1)       # reserved + dref index
    body += struct.pack(">HH", 0, 0) + b"\x00" * 12  # pre_defined/reserved
    body += struct.pack(">HH", w, h)
    body += struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
    body += b"\x00" * 32                             # compressorname
    body += struct.pack(">Hh", 24, -1)               # depth, pre_defined
    return _box(fourcc, body)


def _audio_entry(fourcc: bytes, channels: int, rate: int) -> bytes:
    body = b"\x00" * 6 + struct.pack(">H", 1)
    body += struct.pack(">IIHHHHI", 0, 0, channels, 16, 0, 0, rate << 16)
    return _box(fourcc, body)


def _stbl(entry: bytes, deltas: list[tuple[int, int]], sizes: list[int],
          chunk_offset: int, co64: bool) -> bytes:
    stsd = _box(b"stsd", _full(0) + struct.pack(">I", 1) + entry)
    stts = _box(b"stts", _full(0) + struct.pack(">I", len(deltas))
                + b"".join(struct.pack(">II", c, d) for c, d in deltas))
    stsc = _box(b"stsc", _full(0) + struct.pack(">IIII", 1, 1, len(sizes), 1))
    stsz = _box(b"stsz", _full(0) + struct.pack(">II", 0, len(sizes))
                + b"".join(struct.pack(">I", s) for s in sizes))
    if co64:
        stco = _box(b"co64", _full(0) + struct.pack(">IQ", 1, chunk_offset))
    else:
        stco = _box(b"stco", _full(0) + struct.pack(">II", 1, chunk_offset))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _trak(version: int, track_id: int, movie_dur: int, handler: bytes,
          entry: bytes, timescale: int, media_dur: int,
          deltas: list[tuple[int, int]], sizes: list[int],
          chunk_offset: int, co64: bool, w: int = 0, h: int = 0) -> bytes:
    mdia = _box(
        b"mdia",
        _mdhd(version, timescale, media_dur) + _hdlr(handler)
        + _box(b"minf", _stbl(entry, deltas, sizes, chunk_offset, co64)),
    )
    return _box(b"trak", _tkhd(version, track_id, movie_dur, w, h) + mdia)


def video_fixture_params(doc_id: int) -> dict:
    """The generative formulas — shared by the muxer and the oracle."""
    did = int(doc_id)
    fps = 10 + (did % 3) * 5                     # 10 / 15 / 20
    n = 2 + did % 4
    return {
        "fps": fps,
        "n_frames": n,
        "movie_duration": n * (600 // fps),      # movie timescale 600
        "width": 16 + (did % 4) * 8,
        "height": 8 + (did % 3) * 8,
        "video_codec": "avc1" if did % 2 == 0 else "mp4v",
        "version": 1 if did % 4 == 3 else 0,     # v1 + co64 layout
        "has_audio": did % 2 == 1,
        "n_audio_samples": 3 + did % 5,
        "video_sizes": [50 + (did * 31 + i * 17) % 100 for i in range(n)],
        "audio_sizes": [20 + (did * 13 + j * 7) % 40
                        for j in range(3 + did % 5)],
        "first_bytes": [(did * 7 + i * 31) % 256 for i in range(n)],
    }


def make_fixture_mp4(doc_id: int) -> bytes:
    """A complete two-box-layout MP4: ftyp + moov + mdat, audio track on
    odd docs, 64-bit (v1 + co64 + largesize mdat) layout on
    ``doc_id % 4 == 3``."""
    p = video_fixture_params(doc_id)
    ver, co64 = p["version"], p["version"] == 1
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")

    def moov_bytes(video_off: int, audio_off: int) -> bytes:
        traks = _trak(
            ver, 1, p["movie_duration"], b"vide",
            _visual_entry(p["video_codec"].encode(), p["width"], p["height"]),
            p["fps"], p["n_frames"], [(p["n_frames"], 1)],
            p["video_sizes"], video_off, co64,
            w=p["width"], h=p["height"],
        )
        if p["has_audio"]:
            m = p["n_audio_samples"]
            traks += _trak(
                ver, 2, p["movie_duration"], b"soun",
                _audio_entry(b"mp4a", 2, 8000),
                8000, m * 1024, [(m, 1024)], p["audio_sizes"], audio_off,
                co64,
            )
        return _box(
            b"moov", _mvhd(ver, 600, p["movie_duration"]) + traks
        )

    # chunk offsets are absolute file offsets into mdat's payload; the
    # moov size does not depend on the offset VALUES (fixed-width
    # fields), so one dry run with zeros fixes the geometry
    dry = moov_bytes(0, 0)
    mdat_header = 16 if co64 else 8              # exercise largesize
    video_off = len(ftyp) + len(dry) + mdat_header
    audio_off = video_off + sum(p["video_sizes"])
    moov = moov_bytes(video_off, audio_off)
    assert len(moov) == len(dry)

    payload = bytearray()
    for i, size in enumerate(p["video_sizes"]):
        payload += bytes([p["first_bytes"][i]])
        payload += bytes(((doc_id * 3 + i + k) % 251) for k in range(size - 1))
    if p["has_audio"]:
        for j, size in enumerate(p["audio_sizes"]):
            payload += bytes(((doc_id * 11 + j * 5 + k) % 253)
                             for k in range(size))
    return ftyp + moov + _box(b"mdat", bytes(payload), largesize=co64)


def _walk(data: bytes, start: int, end: int):
    """Yield ``(type, payload_start, payload_end)`` for each box in
    ``data[start:end]``, honoring largesize (size==1) and to-end
    (size==0).  Raises ValueError on truncation or nonsense sizes."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at offset {pos}")
        size = int.from_bytes(data[pos:pos + 4], "big")
        btype = data[pos + 4:pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated largesize at offset {pos}")
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(
                f"box {btype!r} at {pos} overruns its parent "
                f"(size {size}, parent end {end})"
            )
        yield btype, pos + header, pos + size
        pos += size
    if pos != end:
        raise ValueError(f"box walk ended at {pos}, parent end {end}")


def _parse_track(data: bytes, start: int, end: int) -> dict:
    t: dict = {"handler": None, "codec": None, "timescale": None,
               "media_duration": None, "n_samples": None, "sizes": None,
               "chunk_offset": None, "deltas": None, "width": None,
               "height": None, "version": None}

    def descend(s, e, depth=0):
        if depth > 40:
            raise ValueError("MP4 box nesting deeper than 40 levels")
        for btype, ps, pe in _walk(data, s, e):
            if btype in (b"tkhd", b"mdhd", b"stsd", b"stts", b"stsz",
                         b"stco", b"co64", b"hdlr") and pe - ps < 12:
                raise ValueError(f"full box {btype!r} payload too short")
            if btype in _CONTAINERS:
                descend(ps, pe, depth + 1)
            elif btype == b"tkhd":
                ver = data[ps]
                t["version"] = ver
                # ver/flags 4 | times+id+reserved+duration (20 v0 / 32
                # v1) | reserved8+layer2+altgroup2+volume2+reserved2=16
                # | matrix 36 | width.16 height.16
                base = ps + 4 + (20 if ver == 0 else 32) + 16 + 36
                t["width"] = int.from_bytes(data[base:base + 4], "big") >> 16
                t["height"] = (
                    int.from_bytes(data[base + 4:base + 8], "big") >> 16
                )
            elif btype == b"mdhd":
                ver = data[ps]
                if ver == 1:
                    t["timescale"] = int.from_bytes(data[ps + 20:ps + 24],
                                                    "big")
                    t["media_duration"] = int.from_bytes(
                        data[ps + 24:ps + 32], "big")
                else:
                    t["timescale"] = int.from_bytes(data[ps + 12:ps + 16],
                                                    "big")
                    t["media_duration"] = int.from_bytes(
                        data[ps + 16:ps + 20], "big")
            elif btype == b"hdlr":
                t["handler"] = data[ps + 8:ps + 12].decode("ascii")
            elif btype == b"stsd":
                n_entries = int.from_bytes(data[ps + 4:ps + 8], "big")
                if n_entries != 1:
                    raise ValueError(f"expected 1 stsd entry, {n_entries}")
                for etype, _, _ in _walk(data, ps + 8, pe):
                    t["codec"] = etype.decode("ascii")
            elif btype == b"stts":
                n = int.from_bytes(data[ps + 4:ps + 8], "big")
                t["deltas"] = [
                    (int.from_bytes(data[ps + 8 + 8 * k:ps + 12 + 8 * k],
                                    "big"),
                     int.from_bytes(data[ps + 12 + 8 * k:ps + 16 + 8 * k],
                                    "big"))
                    for k in range(n)
                ]
            elif btype == b"stsz":
                fixed = int.from_bytes(data[ps + 4:ps + 8], "big")
                n = int.from_bytes(data[ps + 8:ps + 12], "big")
                t["n_samples"] = n
                if fixed:
                    t["sizes"] = [fixed] * n
                else:
                    if ps + 12 + 4 * n > pe:
                        raise ValueError("stsz size table truncated")
                    t["sizes"] = [
                        int.from_bytes(data[ps + 12 + 4 * k:
                                            ps + 16 + 4 * k], "big")
                        for k in range(n)
                    ]
            elif btype == b"stco":
                n = int.from_bytes(data[ps + 4:ps + 8], "big")
                if n != 1:
                    raise ValueError("fixture muxer writes one chunk/track")
                t["chunk_offset"] = int.from_bytes(data[ps + 8:ps + 12],
                                                   "big")
            elif btype == b"co64":
                n = int.from_bytes(data[ps + 4:ps + 8], "big")
                if n != 1:
                    raise ValueError("fixture muxer writes one chunk/track")
                t["chunk_offset"] = int.from_bytes(data[ps + 8:ps + 16],
                                                   "big")

    descend(start, end)
    for field in ("handler", "codec", "timescale", "media_duration",
                  "n_samples", "sizes", "chunk_offset"):
        if t[field] is None:
            raise ValueError(f"track missing required box for {field}")
    return t


def parse_mp4(data: bytes) -> dict:
    """Full-file parse: movie header, per-track metadata, and the
    load-bearing sample reads (first byte of every video sample,
    resolved through stco+stsz absolute offsets; total stsz mass
    cross-checked against the mdat payload)."""
    mvhd_version = movie_timescale = movie_duration = None
    tracks: list[dict] = []
    mdat_span = None
    saw_ftyp = False
    for btype, ps, pe in _walk(data, 0, len(data)):
        if btype == b"ftyp":
            saw_ftyp = True
        elif btype == b"moov":
            for ctype, cs, ce in _walk(data, ps, pe):
                if ctype == b"mvhd":
                    if ce - cs < 20:
                        raise ValueError("mvhd payload too short")
                    mvhd_version = data[cs]
                    if mvhd_version == 1:
                        movie_timescale = int.from_bytes(
                            data[cs + 20:cs + 24], "big")
                        movie_duration = int.from_bytes(
                            data[cs + 24:cs + 32], "big")
                    else:
                        movie_timescale = int.from_bytes(
                            data[cs + 12:cs + 16], "big")
                        movie_duration = int.from_bytes(
                            data[cs + 16:cs + 20], "big")
                elif ctype == b"trak":
                    tracks.append(_parse_track(data, cs, ce))
        elif btype == b"mdat":
            mdat_span = (ps, pe)
    if not saw_ftyp:
        raise ValueError("no ftyp box")
    if mvhd_version is None:
        raise ValueError("no mvhd box")
    if not movie_timescale:
        raise ValueError("zero movie timescale")
    if mdat_span is None:
        raise ValueError("no mdat box")

    total = sum(sum(t["sizes"]) for t in tracks)
    mdat_bytes = mdat_span[1] - mdat_span[0]
    if total != mdat_bytes:
        raise ValueError(
            f"stsz mass {total} != mdat payload {mdat_bytes}"
        )
    video = [t for t in tracks if t["handler"] == "vide"]
    audio = [t for t in tracks if t["handler"] == "soun"]
    if len(video) != 1 or len(audio) > 1:
        raise ValueError("expected one video track and at most one audio")
    v = video[0]
    for t in tracks:
        if t["chunk_offset"] + sum(t["sizes"]) > len(data):
            raise ValueError("chunk runs past end of file")
        if not (mdat_span[0] <= t["chunk_offset"] < mdat_span[1]):
            raise ValueError("chunk offset outside mdat")
    # the load-bearing read: first byte of every video sample
    fold, pos = 0, v["chunk_offset"]
    for size in v["sizes"]:
        if size == 0 or pos >= len(data):
            raise ValueError("zero-byte sample or read past end of file")
        fold += data[pos]
        pos += size
    a = audio[0] if audio else None
    return {
        "mvhd_version": mvhd_version,
        "movie_timescale": movie_timescale,
        "movie_duration": movie_duration,
        "duration_ms": movie_duration * 1000 // movie_timescale,
        "n_tracks": len(tracks),
        "video_codec": v["codec"],
        "width": v["width"],
        "height": v["height"],
        "fps_timescale": v["timescale"],
        "n_frames": v["n_samples"],
        "video_sample_bytes": sum(v["sizes"]),
        "audio_codec": a["codec"] if a else "",
        "n_audio_samples": a["n_samples"] if a else 0,
        "audio_sample_bytes": sum(a["sizes"]) if a else 0,
        "mdat_bytes": mdat_bytes,
        "first_byte_fold": fold,
    }
