"""Audio fingerprint near-dup (operators/audiofp.py, round 7): the
energy-delta-sign bits must be invariant to tail extension (same track,
longer recording), sensitive to different content, and strict on
malformed/short/stereo input.  audio_fingerprint_dedup is oracle-gated
in test_oracle."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.audiofp import (
    audio_fingerprint,
)
from hainan_big_data_recommend_system_spark.operators.wav import (
    make_wav,
    make_wav_stereo,
)


def test_tail_extension_preserves_fingerprint():
    base = make_wav("track-a", 528)
    longer = make_wav("track-a", 528 + 96)  # same source, longer tail
    fp1, nw1 = audio_fingerprint(base)
    fp2, nw2 = audio_fingerprint(longer)
    assert fp1 == fp2
    assert nw1 == 33 and nw2 == 39


def test_different_content_differs():
    fps = {audio_fingerprint(make_wav(f"track-{i}", 560))[0] for i in range(20)}
    assert len(fps) == 20  # 32 bits over md5 noise: no accidental collisions


def test_short_and_stereo_rejected():
    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint(make_wav("x", 100))
    with pytest.raises(ValueError, match="mono"):
        audio_fingerprint(make_wav_stereo("x", 600))


def test_fingerprint_is_energy_delta_signs():
    import hashlib

    import numpy as np

    payload = make_wav("spot", 528)
    fp, _ = audio_fingerprint(payload)
    s = np.array(
        [
            int(hashlib.md5(f"spot:{i}".encode()).hexdigest()[:4], 16) - 32768
            for i in range(528)
        ],
        dtype=np.int64,
    )
    e = (s.reshape(33, 16) ** 2).sum(axis=1)
    want = sum((1 << j) for j in range(32) if e[j + 1] > e[j])
    assert fp == want
