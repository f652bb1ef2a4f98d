"""WAV codec: round-trip, by-hand feature pins, corrupt-payload contract."""

from __future__ import annotations

import struct

import pytest

from hainan_big_data_recommend_system_spark.operators.wav import (
    make_wav,
    parse_wav,
    wav_features,
)


def _wav_from_samples(samples, rate=8000):
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_round_trip():
    wav = make_wav("seed", 50, 8000)
    rate, ch, bits, pcm = parse_wav(wav)
    assert (rate, ch, bits, len(pcm)) == (8000, 1, 16, 100)


def test_features_by_hand():
    # samples: 100, -200, 300, 0, -1  →  peak 300
    # crossings (>=0 convention): 100→-200 X, -200→300 X, 300→0 no,
    # 0→-1 X  → 3
    wav = _wav_from_samples([100, -200, 300, 0, -1])
    rate, ch, bits, n, peak, zc, energy = wav_features(wav)
    assert (n, peak, zc) == (5, 300, 3)
    assert energy == 100**2 + 200**2 + 300**2 + 0 + 1


def test_empty_data_chunk():
    wav = _wav_from_samples([])
    assert wav_features(wav)[3:] == (0, 0, 0, 0)


def test_odd_chunk_alignment_skipped():
    # an odd-length junk chunk before fmt must be skipped via word
    # alignment without desyncing the walk
    base = _wav_from_samples([7])
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    patched = base[:12] + junk + base[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert wav_features(patched)[3] == 1


@pytest.mark.parametrize(
    "mutate",
    [
        lambda w: b"XIFF" + w[4:],                  # bad magic
        lambda w: w[:30],                            # truncated
        lambda w: w[:20] + b"\x03" + w[21:],         # non-PCM format tag
        lambda w: w[:-1],                            # data chunk truncated
    ],
)
def test_corrupt_payloads_raise_valueerror(mutate):
    wav = make_wav("x", 10)
    with pytest.raises(ValueError):
        wav_features(mutate(wav))


def test_generative_samples_are_stable():
    # the fixture formula is load-bearing for the oracle: pin two values
    from hainan_big_data_recommend_system_spark.operators.wav import _sample

    import hashlib

    for i in (0, 7):
        h = hashlib.md5(f"5:wavv1:{i}".encode()).hexdigest()
        assert _sample("5:wavv1", i) == int(h[:4], 16) - 32768


def test_trailing_bytes_after_riff_body_ok():
    # metadata trailers appended after the RIFF body are not chunks;
    # the walk must stop at the RIFF boundary and still decode
    wav = make_wav("t", 5) + b"JUNKJUNKJUNK"
    assert wav_features(wav)[3] == 5


def test_stereo_rejected():
    # round 6: stereo streams PARSE now, but the mono feature pass still
    # refuses them (wav_features_stereo is the stereo path); >2 channels
    # remain a parse error
    pcm = struct.pack("<hh", 1000, -1000) * 4
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="mono features"):
        wav_features(wav)
    fmt3 = struct.pack("<HHIIHH", 1, 3, 8000, 8000 * 6, 6, 16)
    body3 = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt3)) + fmt3
             + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="channels"):
        wav_features(b"RIFF" + struct.pack("<I", len(body3)) + body3)


def test_stereo_roundtrip_and_channel_separation():
    """Round-6 stereo path: deinterleave must keep channels intact — the
    per-channel features equal those computed from the generative
    formula directly, and mixing L into R would break both energies."""
    import numpy as np

    from hainan_big_data_recommend_system_spark.operators.wav import (
        _sample,
        make_wav_stereo,
        wav_features_stereo,
    )

    rate, n, L, R = wav_features_stereo(make_wav_stereo("sep", 40))
    assert (rate, n) == (8000, 40)
    for ch, got in (("L", L), ("R", R)):
        s = np.array(
            [_sample(f"sep:{ch}", i) for i in range(40)], dtype=np.int64
        )
        nn = s >= 0
        assert got == (
            int(np.abs(s).max()),
            int((nn[1:] != nn[:-1]).sum()),
            int((s * s).sum()),
        )


def test_mono_features_refuse_stereo_stream():
    import pytest as _pytest

    from hainan_big_data_recommend_system_spark.operators.wav import (
        make_wav_stereo,
        wav_features,
    )

    with _pytest.raises(ValueError, match="mono features"):
        wav_features(make_wav_stereo("x", 8))
