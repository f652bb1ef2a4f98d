"""ADTS (AAC) frame-header metadata walk — the other half of crawled
audio next to MP3 (operators/mp3.py): AAC streams ship as ADTS frames,
each led by a 7-byte header (9 with CRC) whose 13-bit frame length
makes the stream self-framing, exactly like the MP3 walk.

Per ISO/IEC 13818-7 §6.2 (ADTS syntax, public spec):

- 12-bit syncword 0xFFF, MPEG version bit, 2-bit layer (always 00),
  ``protection_absent`` (0 → a 2-byte CRC follows the header);
- 2-bit profile (Main/LC/SSR/LTP), 4-bit sampling-frequency index into
  the public rate table, 3-bit channel configuration — the fields a
  corpus pipeline needs for routing and duration accounting;
- 13-bit ``aac_frame_length`` counting the WHOLE frame including the
  header and CRC — the walk advances by it and resynchronizes or dies;
- 11-bit buffer fullness (0x7FF conventionally marks VBR);
- 2-bit ``number_of_raw_data_blocks_in_frame``: the frame carries
  ``rdb+1`` blocks of 1024 samples each — the real-world gotcha that
  makes ``frames × 1024`` the WRONG duration formula.

Duration is therefore ``Σ(rdb_k + 1) · 1024 / rate`` — exact integer
milliseconds.  The parser rejects lost sync, reserved frequency
indexes, mid-stream rate/channel changes, and frames whose declared
length cannot cover their own header.
"""

from __future__ import annotations

#: ISO/IEC 13818-7 sampling_frequency_index table (12 valid entries)
SAMPLE_RATES = [
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000,
]
PROFILES = ["Main", "LC", "SSR", "LTP"]
_VBR_FULLNESS = 0x7FF


def _header(
    profile: int,
    sfi: int,
    channels: int,
    frame_len: int,
    fullness: int,
    rdb: int,
    crc: bool,
) -> bytes:
    b = bytearray(7)
    b[0] = 0xFF
    b[1] = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
    b[2] = (
        ((profile & 3) << 6)
        | ((sfi & 0xF) << 2)
        | (0 << 1)
        | ((channels >> 2) & 1)
    )
    b[3] = ((channels & 3) << 6) | ((frame_len >> 11) & 3)
    b[4] = (frame_len >> 3) & 0xFF
    b[5] = ((frame_len & 7) << 5) | ((fullness >> 6) & 0x1F)
    b[6] = ((fullness & 0x3F) << 2) | (rdb & 3)
    return bytes(b)


def make_adts(
    frames: list[tuple[int, int]],
    profile: int,
    sfi: int,
    channels: int,
    crc: bool = False,
    vbr: bool = False,
) -> bytes:
    """Frames as ``(rdb, payload_len)`` tuples.  ``rdb`` is the 2-bit
    raw-data-block field (``rdb+1`` blocks of 1024 samples); payload is
    deterministic filler.  With ``crc`` a 2-byte checksum placeholder
    follows each header (header size 9)."""
    if not 0 <= sfi < len(SAMPLE_RATES):
        raise ValueError(f"reserved sampling_frequency_index {sfi}")
    out = bytearray()
    for i, (rdb, payload_len) in enumerate(frames):
        hdr_len = 9 if crc else 7
        flen = hdr_len + payload_len
        if flen >= 1 << 13:
            raise ValueError("frame length exceeds the 13-bit field")
        fullness = _VBR_FULLNESS if vbr else (0x123 + i) % _VBR_FULLNESS
        out += _header(
            profile, sfi, channels, flen, fullness, rdb, crc
        )
        if crc:
            out += bytes([(0xAB + i) & 0xFF, (0xCD + i) & 0xFF])
        out += bytes(((i * 31 + j * 7) % 253) for j in range(payload_len))
    return bytes(out)


def parse_adts(payload: bytes) -> dict:
    """``{n_frames, sample_rate, channels, profile, total_blocks,
    stream_bytes, duration_ms, is_vbr, has_crc}`` from a frame walk.
    Raises ValueError on lost sync, reserved indexes, truncation, or
    mid-stream parameter changes."""
    pos = 0
    n_frames = 0
    total_blocks = 0
    rate = channels = profile = None
    has_crc = None
    all_vbr = True
    while pos < len(payload):
        if pos + 7 > len(payload):
            raise ValueError(f"trailing bytes at {pos} are not a frame")
        b = payload[pos : pos + 7]
        if b[0] != 0xFF or (b[1] & 0xF0) != 0xF0:
            raise ValueError(f"lost ADTS sync at offset {pos}")
        if (b[1] >> 1) & 3 != 0:
            raise ValueError("layer bits must be 00 in ADTS")
        crc = not (b[1] & 1)
        prof = (b[2] >> 6) & 3
        sfi = (b[2] >> 2) & 0xF
        if sfi >= len(SAMPLE_RATES):
            raise ValueError(f"reserved sampling_frequency_index {sfi}")
        chan = ((b[2] & 1) << 2) | ((b[3] >> 6) & 3)
        flen = ((b[3] & 3) << 11) | (b[4] << 3) | ((b[5] >> 5) & 7)
        fullness = ((b[5] & 0x1F) << 6) | ((b[6] >> 2) & 0x3F)
        rdb = b[6] & 3
        hdr_len = 9 if crc else 7
        if flen < hdr_len:
            raise ValueError(
                f"frame at {pos} declares {flen} bytes, below its "
                f"own {hdr_len}-byte header"
            )
        if pos + flen > len(payload):
            raise ValueError(f"frame at {pos} truncated ({flen} bytes)")
        if rate is None:
            rate, channels, profile, has_crc = (
                SAMPLE_RATES[sfi], chan, prof, crc,
            )
        elif (
            rate != SAMPLE_RATES[sfi]
            or channels != chan
            or profile != prof
        ):
            raise ValueError("stream parameters change mid-stream")
        all_vbr = all_vbr and fullness == _VBR_FULLNESS
        n_frames += 1
        total_blocks += rdb + 1
        pos += flen
    if n_frames == 0:
        raise ValueError("no ADTS frames found")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "profile": PROFILES[profile],
        "total_blocks": total_blocks,
        "stream_bytes": len(payload),
        "duration_ms": (total_blocks * 1024 * 1000) // rate,
        "is_vbr": all_vbr,
        "has_crc": has_crc,
    }
