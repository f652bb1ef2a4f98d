"""IMA-ADPCM codec (operators/adpcm.py): state-machine exactness, block
boundary behavior, smooth-signal fidelity, malformed-stream rejection.
The adpcm_audio_meta query is oracle-gated (recursive-CTE state machine)
in test_oracle."""

from __future__ import annotations

import math
import struct

import pytest

from hainan_big_data_recommend_system_spark.operators.adpcm import (
    _encode_code,
    _step,
    make_adpcm_wav,
    parse_adpcm_wav,
)
from hainan_big_data_recommend_system_spark.operators.wav import _sample


def _replica(seed: str, n: int, per_block: int = 65) -> list[int]:
    src = [_sample(seed, i) for i in range(n)]
    out: list[int] = []
    for b in range(0, n, per_block):
        chunk = src[b : b + per_block]
        pred, idx = chunk[0], 0
        out.append(pred)
        for s in chunk[1:]:
            pred, idx = _step(pred, idx, _encode_code(s, pred, idx))
            out.append(pred)
    return out


def test_decode_matches_state_machine_replica():
    for n in (1, 2, 33, 65, 66, 130, 200):  # incl. exact block boundaries
        rate, ns, dec = parse_adpcm_wav(make_adpcm_wav("probe", n))
        assert (rate, ns) == (8000, n)
        assert dec == _replica("probe", n), n


def test_smooth_signal_fidelity():
    """ADPCM tracks smooth signals well: on a sine sweep the decoded
    reconstruction must reach a real SNR (the md5-noise fixtures are the
    worst case and only pin determinism)."""
    import numpy as np

    from hainan_big_data_recommend_system_spark.operators.adpcm import (
        adpcm_encode_block,
    )

    n = 200  # one long block: the cold-start step-index attack lag
    # (a real ADPCM property — the index ramps from 0) amortizes away
    src = [int(12000 * math.sin(2 * math.pi * i / 40)) for i in range(n)]
    block = adpcm_encode_block(src, 104)
    # decode via the public parser by wrapping in a WAV
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, 104, 4, 2, 201)
    fact = struct.pack("<I", n)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(block)) + block)
    _, _, dec = parse_adpcm_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    s = np.array(src, dtype=np.float64)
    e = s - np.array(dec, dtype=np.float64)
    snr = 10 * math.log10((s * s).sum() / max((e * e).sum(), 1))
    # whole-signal SNR includes the cold-start attack transient; the
    # locked-in tail must track much tighter
    assert snr > 15, f"SNR {snr:.1f} dB on a smooth signal"
    st, et = s[100:], e[100:]
    tail_snr = 10 * math.log10((st * st).sum() / max((et * et).sum(), 1))
    assert tail_snr > 25, f"steady-state SNR {tail_snr:.1f} dB"


def test_rejects_malformed():
    good = make_adpcm_wav("bad", 40)
    with pytest.raises(ValueError, match="RIFF"):
        parse_adpcm_wav(b"XXXX" + good[4:])
    with pytest.raises(ValueError):
        parse_adpcm_wav(good[:-7])  # truncated data chunk
    # step index out of range in a block header
    g = bytearray(good)
    i = g.find(b"data") + 8
    g[i + 2] = 99
    with pytest.raises(ValueError, match="step index"):
        parse_adpcm_wav(bytes(g))
    # PCM parser must refuse the ADPCM tag, not mis-decode
    from hainan_big_data_recommend_system_spark.operators.wav import parse_wav

    with pytest.raises(ValueError, match="format tag|PCM"):
        parse_wav(good)
