"""Pure-Python WAV (RIFF PCM) codec + audio feature extraction — the
audio leg of the multimodal surface, held to the same standard as the
BMP/PNG/JPEG decoders (operators/multimodal.py, operators/jpeg.py): a
REAL byte-level decode, deterministic fixtures, and features exact
enough to oracle-check.

``make_wav`` writes a canonical 16-bit mono PCM RIFF/WAVE stream whose
samples are a pure integer function of ``(seed, index)`` (an md5 chain —
the same generative-fixture trick as ``make_png``), and ``parse_wav``
walks the chunks back: RIFF magic, fmt geometry, data payload.  The
catalog query (qcatalog/textstats.py: ``audio_meta``) decodes the real
bytes in Spark while the DuckDB oracle RECOMPUTES the expected features
from the generative formula alone — so a header-only fake would fail the
hash match; only an actual PCM decode agrees.

Features are exact integer arithmetic over int16 samples (energy Σs²,
peak |s|, zero crossings with a pinned ``>= 0`` sign convention), so no
float ever enters the comparison.
"""

from __future__ import annotations

import hashlib
import struct


def _sample(seed: str, i: int) -> int:
    """Deterministic int16 sample: first 4 md5 hex digits of
    ``seed:i`` → [0, 65535] → centered to [-32768, 32767]."""
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    return int(h[:4], 16) - 32768


def make_wav(seed: str, n_samples: int, sample_rate: int = 8000) -> bytes:
    """Canonical 16-bit mono PCM WAV with generatively-pinned samples."""
    pcm = b"".join(
        struct.pack("<h", _sample(seed, i)) for i in range(n_samples)
    )
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """``(sample_rate, n_channels, bits, pcm)`` from a RIFF/WAVE stream.

    Chunk-walking parser: validates the RIFF/WAVE magic, reads the fmt
    geometry (PCM only), and returns the raw data payload.  Raises
    ``ValueError`` on anything malformed — the corrupt-row contract of
    the other decoders (one bad payload must never kill a corpus job)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_len = struct.unpack("<I", payload[4:8])[0]
    end = riff_len + 8
    if end > len(payload):
        raise ValueError("truncated RIFF payload")
    # the walk stops at the RIFF boundary, not the payload end: trailing
    # bytes after the RIFF body (metadata trailers some tools append) are
    # not chunks and must not be parsed as one
    pos, fmt, data = 12, None, None
    while pos + 8 <= end:
        ctype = payload[pos : pos + 4]
        clen = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if pos + 8 + clen > end:
            raise ValueError(f"truncated {ctype!r} chunk")
        body = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
            if fmt[0] != 1:
                raise ValueError(f"not PCM (format tag {fmt[0]})")
        elif ctype == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    _, channels, rate, _, block, bits = fmt
    if bits != 16 or block != channels * 2:
        raise ValueError(f"unsupported geometry: {bits}-bit, block {block}")
    if channels not in (1, 2):
        raise ValueError(f"unsupported geometry: {channels} channels")
    if len(data) % block:
        raise ValueError("data length not sample-aligned")
    return rate, channels, bits, data


def wav_features(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """``(sample_rate, n_channels, bits, n_samples, peak_abs, n_zero_cross,
    energy)`` — exact integers from a real decode.

    Zero-crossing convention (pinned so the oracle can mirror it): a
    crossing at ``i`` iff ``(s[i-1] >= 0) != (s[i] >= 0)``."""
    import numpy as np

    rate, channels, bits, pcm = parse_wav(payload)
    if channels != 1:
        # this feature pass treats PCM as one stream; interleaved stereo
        # would report nonsense crossings — use wav_features_stereo
        raise ValueError(f"mono features on a {channels}-channel stream")
    s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
    n = len(s)
    if n == 0:
        return rate, channels, bits, 0, 0, 0, 0
    nonneg = s >= 0
    crossings = int((nonneg[1:] != nonneg[:-1]).sum())
    return (
        rate,
        channels,
        bits,
        n,
        int(np.abs(s).max()),
        crossings,
        int((s * s).sum()),
    )


def make_wav_stereo(seed: str, n_samples: int, sample_rate: int = 8000) -> bytes:
    """Canonical 16-bit STEREO PCM WAV: interleaved L/R frames whose
    per-channel samples are the same generative md5 chain with a
    channel-tagged seed (``seed:L`` / ``seed:R``) — so a stereo decode
    is oracle-checkable exactly like the mono one."""
    pcm = b"".join(
        struct.pack("<hh", _sample(f"{seed}:L", i), _sample(f"{seed}:R", i))
        for i in range(n_samples)
    )
    byte_rate = sample_rate * 4
    fmt = struct.pack("<HHIIHH", 1, 2, sample_rate, byte_rate, 4, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_features_stereo(payload: bytes):
    """``(sample_rate, n_frames, (peak_l, zc_l, energy_l),
    (peak_r, zc_r, energy_r))`` — per-channel exact-integer features of
    an interleaved stereo stream (deinterleave, then the same pinned
    conventions as :func:`wav_features`)."""
    import numpy as np

    rate, channels, bits, pcm = parse_wav(payload)
    if channels != 2:
        raise ValueError(f"stereo features on a {channels}-channel stream")
    s = np.frombuffer(pcm, dtype="<i2").astype(np.int64).reshape(-1, 2)

    def feats(ch):
        if len(ch) == 0:
            return 0, 0, 0
        nonneg = ch >= 0
        return (
            int(np.abs(ch).max()),
            int((nonneg[1:] != nonneg[:-1]).sum()),
            int((ch * ch).sum()),
        )

    return rate, s.shape[0], feats(s[:, 0]), feats(s[:, 1])
