"""Matroska/WebM (EBML) container metadata walk — the other big web
video container next to ISO-BMFF (operators/mp4.py): WebM is the
default container for VP8/VP9/AV1 + Opus/Vorbis on the open web, so a
crawl pipeline meets it immediately after MP4.

Per RFC 8794 (EBML) and the public Matroska element registry:

- Every element is ``VINT id, VINT size, payload``.  A VINT's first
  byte's leading-zero count gives its total length; element IDs keep
  the length-marker bit, SIZES strip it — the classic implementation
  trap this parser gets right (and the fixture round-trip pins).
- Master elements (EBML header, Segment, Info, Tracks, TrackEntry,
  Cluster, …) nest; unknown elements are SKIPPED BY SIZE — the
  forward-compatibility contract that makes EBML walkable without a
  full schema.
- Duration lives in Info as a FLOAT — so this walk derives an exact
  integer duration from the LAST SimpleBlock instead: cluster
  Timestamp (uint) + the block's signed 16-bit relative timestamp,
  scaled by TimestampScale (ns per tick) into milliseconds — integer
  end to end, engine-stable.

The parser validates VINT framing (an all-zero first byte is
malformed), declared sizes against the buffer, and the EBML DocType;
any malformation raises ValueError for the standard quarantine path.
"""

from __future__ import annotations

# element IDs (with marker bit, as they appear on the wire)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIX_W = 0xB0
_PIX_H = 0xBA
_AUDIO = 0xE1
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3

_MASTERS = {_EBML, _SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO,
            _AUDIO, _CLUSTER}


def _vint_bytes(value: int, keep_marker: bool = False) -> bytes:
    """Encode ``value`` as an EBML VINT (size semantics: marker bit
    stripped on read).  For IDs pass the full on-wire integer and
    ``keep_marker=True``."""
    if keep_marker:
        n = (value.bit_length() + 7) // 8
        return value.to_bytes(n, "big")
    for n in range(1, 9):
        if value < (1 << (7 * n)) - 1:  # all-ones is reserved (unknown)
            return ((1 << (7 * n)) | value).to_bytes(n, "big")
    raise ValueError("VINT value too large")


def _elem(eid: int, payload: bytes) -> bytes:
    return (
        _vint_bytes(eid, keep_marker=True)
        + _vint_bytes(len(payload))
        + payload
    )


def _uint(value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return value.to_bytes(n, "big")


def make_webm(
    tracks: list[tuple[int, str, int, int]],
    clusters: list[tuple[int, list[int]]],
    timestamp_scale: int = 1_000_000,
    doctype: str = "webm",
) -> bytes:
    """Build a real EBML stream.  ``tracks`` rows are
    ``(track_type, codec_id, a, b)`` — for video ``a, b`` are pixel
    width/height, for audio ``a`` is the channel count (``b`` ignored).
    ``clusters`` rows are ``(cluster_ts, [rel_ts, ...])`` — one
    SimpleBlock per rel_ts on track 1."""
    header = _elem(
        _EBML, _elem(_DOCTYPE, doctype.encode("ascii"))
    )
    body = _elem(_INFO, _elem(_TS_SCALE, _uint(timestamp_scale)))
    entries = b""
    for i, (ttype, codec, a, b) in enumerate(tracks, start=1):
        inner = (
            _elem(_TRACK_NUMBER, _uint(i))
            + _elem(_TRACK_TYPE, _uint(ttype))
            + _elem(_CODEC_ID, codec.encode("ascii"))
        )
        if ttype == 1:
            inner += _elem(
                _VIDEO, _elem(_PIX_W, _uint(a)) + _elem(_PIX_H, _uint(b))
            )
        elif ttype == 2:
            inner += _elem(_AUDIO, _elem(_CHANNELS, _uint(a)))
        entries += _elem(_TRACK_ENTRY, inner)
    body += _elem(_TRACKS, entries)
    for cts, rels in clusters:
        c = _elem(_CLUSTER_TS, _uint(cts))
        for j, rel in enumerate(rels):
            if not -0x8000 <= rel < 0x8000:
                raise ValueError("relative timestamp exceeds int16")
            payload = (
                _vint_bytes(1)                      # track number VINT
                + rel.to_bytes(2, "big", signed=True)
                + b"\x80"                           # keyframe flag
                + bytes(((cts + j) % 251,)) * 3     # tiny frame body
            )
            c += _elem(_SIMPLE_BLOCK, payload)
        body += _elem(_CLUSTER, c)
    return header + _elem(_SEGMENT, body)


def _read_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    if pos >= len(buf):
        raise ValueError(f"VINT expected at {pos}, buffer exhausted")
    first = buf[pos]
    if first == 0:
        raise ValueError(f"malformed VINT (leading byte 0x00) at {pos}")
    n = 8 - first.bit_length() + 1
    if pos + n > len(buf):
        raise ValueError(f"VINT at {pos} truncated")
    raw = int.from_bytes(buf[pos : pos + n], "big")
    if not keep_marker:
        raw &= (1 << (7 * n)) - 1
    return raw, pos + n


def parse_webm(payload: bytes) -> dict:
    """``{doctype, timestamp_scale, n_tracks, n_video, n_audio,
    codecs, video_width, video_height, audio_channels, n_clusters,
    n_blocks, duration_ms}`` from a recursive EBML walk.  Unknown
    elements are skipped by declared size; malformed framing raises
    ValueError."""
    out = {
        "doctype": None,
        "timestamp_scale": 1_000_000,
        "n_tracks": 0,
        "n_video": 0,
        "n_audio": 0,
        "codecs": [],
        "video_width": None,
        "video_height": None,
        "audio_channels": None,
        "n_clusters": 0,
        "n_blocks": 0,
        "duration_ms": 0,
    }
    state = {"cluster_ts": 0, "last_tick": 0, "track_type": None}

    def walk(buf: bytes, lo: int, hi: int, depth: int = 0) -> None:
        # Nested containers cost ~3 bytes each; an uncapped recursive
        # walk turns a few-KB crafted file into RecursionError instead
        # of the ValueError quarantine contract (cap mirrors
        # parquetfmt._read_struct).
        if depth > 40:
            raise ValueError("EBML nesting deeper than 40 levels")
        pos = lo
        while pos < hi:
            eid, pos = _read_vint(buf, pos, keep_marker=True)
            size, pos = _read_vint(buf, pos, keep_marker=False)
            if pos + size > hi:
                raise ValueError(
                    f"element 0x{eid:X} declares {size} bytes past "
                    f"its parent's end"
                )
            body = buf[pos:size + pos]
            if eid == _DOCTYPE:
                out["doctype"] = body.decode("ascii", "strict")
            elif eid == _TS_SCALE:
                out["timestamp_scale"] = int.from_bytes(body, "big")
            elif eid == _TRACK_ENTRY:
                out["n_tracks"] += 1
                state["track_type"] = None
                walk(buf, pos, pos + size, depth + 1)
            elif eid == _TRACK_TYPE:
                t = int.from_bytes(body, "big")
                state["track_type"] = t
                if t == 1:
                    out["n_video"] += 1
                elif t == 2:
                    out["n_audio"] += 1
            elif eid == _CODEC_ID:
                out["codecs"].append(body.decode("ascii", "strict"))
            elif eid == _PIX_W:
                out["video_width"] = int.from_bytes(body, "big")
            elif eid == _PIX_H:
                out["video_height"] = int.from_bytes(body, "big")
            elif eid == _CHANNELS:
                out["audio_channels"] = int.from_bytes(body, "big")
            elif eid == _CLUSTER:
                out["n_clusters"] += 1
                state["cluster_ts"] = 0
                walk(buf, pos, pos + size, depth + 1)
            elif eid == _CLUSTER_TS:
                state["cluster_ts"] = int.from_bytes(body, "big")
            elif eid == _SIMPLE_BLOCK:
                _, p2 = _read_vint(body, 0, keep_marker=False)
                if p2 + 3 > len(body):
                    raise ValueError("SimpleBlock too short for header")
                rel = int.from_bytes(
                    body[p2 : p2 + 2], "big", signed=True
                )
                out["n_blocks"] += 1
                tick = state["cluster_ts"] + rel
                state["last_tick"] = max(state["last_tick"], tick)
            elif eid in _MASTERS:
                walk(buf, pos, pos + size, depth + 1)
            # else: unknown element — skip by size (EBML contract)
            pos += size

    if not payload[:4] == bytes.fromhex("1A45DFA3"):
        raise ValueError("not an EBML stream (bad magic)")
    walk(payload, 0, len(payload))
    if out["doctype"] is None:
        raise ValueError("EBML header carries no DocType")
    # ticks are TimestampScale ns each -> exact integer milliseconds
    out["duration_ms"] = (
        state["last_tick"] * out["timestamp_scale"]
    ) // 1_000_000
    return out
