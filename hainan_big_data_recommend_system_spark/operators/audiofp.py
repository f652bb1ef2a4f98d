"""Audio fingerprint near-dup — the audio leg of the dedup ladder
(images have :mod:`.phash`; a crawl's audio needs the same "same track,
different container/tail" collapse).

Scheme: the classic robust-hash bit derivation (Haitsma & Kalker 2002,
"A Highly Robust Audio Fingerprinting System") simplified to one energy
band, kept EXACT-integer so the whole fingerprint is oracle-checkable:

- frame the int16 PCM into fixed ``window``-sample frames;
- per-frame energy ``E[w] = Σ s²`` (exact int64);
- fingerprint bit ``j`` = 1 iff ``E[j+1] > E[j]`` — the energy-delta
  SIGN, which survives re-encoding artifacts that scale amplitude but
  not the envelope shape, and trailing-content changes (the bits only
  read the first ``n_bits+1`` frames);
- dedup = groupBy fingerprint (O(n) shuffle of (doc_id, int64) rows —
  the exact-dedup shape, applied to perceptual identity).

A truncated stream (< ``n_bits+1`` frames) raises — quarantine-by-row
at the caller, the decoders' contract.

Public knowledge: Haitsma & Kalker, ISMIR 2002.
"""

from __future__ import annotations

from .wav import parse_wav

#: frame size in samples; 16 keeps oracle-side md5 volume modest while
#: giving every fixture doc 33+ frames
FP_WINDOW = 16
#: fingerprint width in energy-delta bits
FP_BITS = 32


def audio_fingerprint(
    payload: bytes, window: int = FP_WINDOW, n_bits: int = FP_BITS
) -> tuple[int, int]:
    """``(fingerprint, n_windows)`` of a mono 16-bit PCM WAV payload."""
    import numpy as np

    rate, channels, bits, pcm = parse_wav(payload)
    if channels != 1:
        raise ValueError(f"fingerprint expects mono, got {channels} channels")
    s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
    n_windows = len(s) // window
    if n_windows < n_bits + 1:
        raise ValueError(
            f"stream too short: {n_windows} frames < {n_bits + 1} needed"
        )
    e = (
        (s[: n_windows * window] ** 2)
        .reshape(n_windows, window)
        .sum(axis=1)
    )
    fp = 0
    for j in range(n_bits):
        if e[j + 1] > e[j]:
            fp |= 1 << j
    return fp, n_windows
