"""IMA ADPCM (DVI4) codec for WAV — the compressed-audio leg (round 6).

Crawled audio is rarely raw PCM; IMA ADPCM (WAV format tag 0x11) is the
classic 4:1 compressed PCM found in telephony/game assets.  The codec is
a pure INTEGER state machine — (predictor, step index) advanced by one
4-bit code per sample through fixed public tables — so unlike JPEG's
float DCT the lossy reconstruction is bit-exact reproducible anywhere,
and the catalog query's DuckDB oracle re-runs the same state machine as
a recursive CTE without ever seeing the encoded bytes.

Block layout per the WAV spec: ``block_align`` bytes per block — 4-byte
header (initial predictor int16 LE, step index u8, reserved) then two
4-bit codes per byte (low nibble first); samples per block =
``(block_align - 4) * 2 + 1``.

Public knowledge: IMA Digital Audio Pack recommendations (1992);
Microsoft WAVE format tag 0x0011 documentation.
"""

from __future__ import annotations

import struct

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _step(pred: int, idx: int, code: int) -> tuple[int, int]:
    """Decoder state transition (the encoder uses the same one, so both
    sides track identical state — the property the oracle relies on)."""
    step = STEP_TABLE[idx]
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    pred = _clamp16(pred + (-diffq if code & 8 else diffq))
    idx = idx + INDEX_TABLE[code & 7]
    idx = 0 if idx < 0 else (88 if idx > 88 else idx)
    return pred, idx


def _encode_code(sample: int, pred: int, idx: int) -> int:
    step = STEP_TABLE[idx]
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    return code


def adpcm_encode_block(samples: list[int], block_align: int) -> bytes:
    """One IMA block: header holds the first sample + initial index 0;
    the remaining samples become nibbles."""
    per_block = (block_align - 4) * 2 + 1
    if not 1 <= len(samples) <= per_block:
        raise ValueError(f"{len(samples)} samples exceed block capacity")
    pred, idx = samples[0], 0
    out = bytearray(struct.pack("<hBB", pred, idx, 0))
    nibbles: list[int] = []
    for s in samples[1:]:
        code = _encode_code(s, pred, idx)
        pred, idx = _step(pred, idx, code)
        nibbles.append(code)
    if len(nibbles) % 2:
        nibbles.append(0)
    for lo, hi in zip(nibbles[::2], nibbles[1::2]):
        out.append(lo | (hi << 4))
    out += bytes(block_align - len(out))
    return bytes(out)


def make_adpcm_wav(
    seed: str, n_samples: int, sample_rate: int = 8000, block_align: int = 36
) -> bytes:
    """Mono IMA-ADPCM WAV whose SOURCE samples are the generative md5
    chain (operators/wav._sample) — the oracle replays encoder+decoder
    from that formula alone."""
    from .wav import _sample

    per_block = (block_align - 4) * 2 + 1
    samples = [_sample(seed, i) for i in range(n_samples)]
    blocks = bytearray()
    n_blocks = 0
    for i in range(0, n_samples, per_block):
        blocks += adpcm_encode_block(samples[i : i + per_block], block_align)
        n_blocks += 1
    byte_rate = (sample_rate * block_align + per_block - 1) // per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2,
        per_block,
    )
    fact = struct.pack("<I", n_samples)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_adpcm_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """``(sample_rate, n_samples, decoded int16 samples)`` from a mono
    IMA-ADPCM WAV.  Full chunk walk + per-block state-machine decode;
    ValueError on malformed structure (quarantine contract)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    end = struct.unpack("<I", payload[4:8])[0] + 8
    if end > len(payload):
        raise ValueError("truncated RIFF payload")
    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= end:
        ctype = payload[pos : pos + 4]
        clen = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if pos + 8 + clen > end:
            raise ValueError(f"truncated {ctype!r} chunk")
        body = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"fmt ":
            if clen < 20:
                raise ValueError("fmt chunk too short for ADPCM")
            fmt = struct.unpack("<HHIIHHHH", body[:16] + body[16:20])
        elif ctype == b"fact":
            if clen < 4:
                raise ValueError("truncated fact chunk")
            fact = struct.unpack("<I", body[:4])[0]
        elif ctype == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None or fact is None:
        raise ValueError("missing fmt, fact or data chunk")
    tag, channels, rate, _, block_align, bits, _cb, per_block = fmt
    if tag != 0x11:
        raise ValueError(f"not IMA ADPCM (format tag {tag:#x})")
    if channels != 1 or bits != 4:
        raise ValueError(f"unsupported geometry: {channels} ch, {bits}-bit")
    if per_block != (block_align - 4) * 2 + 1:
        raise ValueError("samples-per-block inconsistent with block align")
    if len(data) % block_align:
        raise ValueError("data length not block-aligned")
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        pred = struct.unpack("<h", block[0:2])[0]
        idx = block[2]
        if idx > 88:
            raise ValueError(f"step index {idx} out of range")
        remaining = min(per_block, fact - len(out))
        if remaining <= 0:
            raise ValueError("more blocks than fact samples")
        out.append(pred)
        taken = 1
        for byte in block[4:]:
            for code in (byte & 0xF, byte >> 4):
                if taken >= remaining:
                    break
                pred, idx = _step(pred, idx, code)
                out.append(pred)
                taken += 1
    if len(out) != fact:
        raise ValueError(f"decoded {len(out)} samples, fact says {fact}")
    return rate, fact, out
