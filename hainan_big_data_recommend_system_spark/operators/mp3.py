"""MP3 (MPEG-1 Layer III) frame-header metadata walk + ID3v2 skip.

Crawled audio is mostly MP3; a corpus pipeline needs its metadata
(bitrate, sample rate, channel mode, duration) without a full synthesis
decode — exactly what the frame-header walk gives: every frame starts
with a syncword header whose index fields resolve through the public
bitrate/samplerate tables, and the frame's byte length follows as
``144 * bitrate / samplerate + padding``, so the walk is self-framing.
An ID3v2 tag (a 'ID3' header with a SYNCSAFE 28-bit size — each byte
contributes 7 bits, the real-world gotcha) may precede the first frame
and is skipped, its declared size reported.

The fixture encoder emits spec-shaped frames with formula-chosen index
fields; the parser validates sync, rejects reserved indexes, and
accumulates per-frame sample counts into an exact integer duration in
milliseconds.  Public knowledge: ISO/IEC 11172-3; id3.org ID3v2.3.
"""

from __future__ import annotations

#: MPEG-1 Layer III bitrate table (kbit/s), index 1-14 (0/15 reserved)
BITRATES = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
            256, 320, None]
#: MPEG-1 sample-rate table, index 0-2 (3 reserved)
SAMPLE_RATES = [44100, 48000, 32000, None]
_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    return (144 * bitrate_kbps * 1000) // sample_rate + padding


def make_mp3(
    frames: list[tuple[int, int, int, int]],
    id3_payload: bytes = b"",
) -> bytes:
    """Frames as ``(bitrate_idx, samplerate_idx, padding, channel_mode)``
    tuples; an ID3v2.3 tag wraps ``id3_payload`` when non-empty."""
    out = bytearray()
    if id3_payload:
        n = len(id3_payload)
        if n >= 1 << 28:
            raise ValueError("ID3 payload too large for syncsafe size")
        ss = bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        out += b"ID3\x03\x00\x00" + ss + id3_payload
    for bi, si, pad, mode in frames:
        if BITRATES[bi] is None or SAMPLE_RATES[si] is None:
            raise ValueError(f"reserved index (bitrate {bi}, rate {si})")
        h = (
            (0x7FF << 21)      # sync
            | (0b11 << 19)     # MPEG-1
            | (0b01 << 17)     # Layer III
            | (1 << 16)        # no CRC
            | (bi << 12)
            | (si << 10)
            | (pad << 9)
            | ((mode & 3) << 6)
        )
        flen = frame_length(BITRATES[bi], SAMPLE_RATES[si], pad)
        body = bytearray(h.to_bytes(4, "big"))
        # deterministic filler: frame index mixed with position
        body += bytes(((len(out) + i * 17) % 251) for i in range(flen - 4))
        out += body
    return bytes(out)


def parse_mp3(payload: bytes) -> dict:
    """``{n_frames, id3_bytes, sample_rate, channel_modes, bitrate_sum_kbps,
    duration_ms}`` from a frame walk.  Raises ValueError on lost sync,
    reserved indexes, or truncated frames."""
    pos = 0
    id3_bytes = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        if any(b & 0x80 for b in payload[6:10]):
            raise ValueError("non-syncsafe ID3v2 size byte")
        size = (
            (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7)
            | payload[9]
        )
        id3_bytes = 10 + size
        if id3_bytes > len(payload):
            raise ValueError("ID3v2 tag runs past end of payload")
        pos = id3_bytes
    n_frames = 0
    rate = None
    modes = set()
    bitrate_sum = 0
    samples = 0
    while pos < len(payload):
        if pos + 4 > len(payload):
            raise ValueError(f"trailing bytes at offset {pos} are not a frame")
        h = int.from_bytes(payload[pos : pos + 4], "big")
        if (h >> 21) != 0x7FF:
            raise ValueError(f"lost frame sync at offset {pos}")
        version = (h >> 19) & 3
        layer = (h >> 17) & 3
        if version != 0b11 or layer != 0b01:
            raise ValueError("only MPEG-1 Layer III in scope")
        bi = (h >> 12) & 0xF
        si = (h >> 10) & 3
        pad = (h >> 9) & 1
        mode = (h >> 6) & 3
        if BITRATES[bi] is None:
            raise ValueError(f"reserved bitrate index {bi}")
        if SAMPLE_RATES[si] is None:
            raise ValueError(f"reserved sample-rate index {si}")
        if rate is None:
            rate = SAMPLE_RATES[si]
        elif rate != SAMPLE_RATES[si]:
            raise ValueError("sample rate changes mid-stream")
        flen = frame_length(BITRATES[bi], SAMPLE_RATES[si], pad)
        if pos + flen > len(payload):
            raise ValueError(f"frame at {pos} truncated ({flen} bytes)")
        n_frames += 1
        bitrate_sum += BITRATES[bi]
        modes.add(mode)
        samples += _SAMPLES_PER_FRAME
        pos += flen
    if n_frames == 0:
        raise ValueError("no MP3 frames found")
    return {
        "n_frames": n_frames,
        "id3_bytes": id3_bytes,
        "sample_rate": rate,
        "channel_modes": sorted(modes),
        "bitrate_sum_kbps": bitrate_sum,
        "duration_ms": (samples * 1000) // rate,
    }
