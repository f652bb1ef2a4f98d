"""Pure-Python LZ4 raw-block decompression (the lz4.org block format).

Parquet codec 7 (LZ4_RAW) compresses each page as one LZ4 BLOCK — no
frame header, no checksum, exactly the layout this decodes.  (Codec 5,
"LZ4", is the deprecated Hadoop framing and stays out of scope with a
loud error at the caller.)

Block format (public spec, github.com/lz4/lz4/blob/dev/doc/
lz4_Block_format.md): a sequence of operations, each

    token: high nibble = literal length (15 ⇒ +255-extension bytes),
           low nibble  = match length - 4 (15 ⇒ extensions)
    <literals> <2-byte LE match offset> <match-length extensions>

The final operation carries literals only (no offset).  Matches may
overlap forward (offset < length ⇒ RLE-style copy), byte-by-byte.

ValueError-only contract, like operators/snappy.py and zstd.py.
"""

from __future__ import annotations

_MAX_OUTPUT = 1 << 28


def lz4_block_decompress(payload: bytes, max_output: int = _MAX_OUTPUT) -> bytes:
    if payload == b"":
        return b""
    out = bytearray()
    pos = 0
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("lz4: truncated token")
        token = payload[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = payload[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4: literals overrun the block")
        out += payload[pos : pos + lit_len]
        pos += lit_len
        if len(out) > max_output:
            raise ValueError("lz4: output exceeds decoder limit")
        if pos == n:  # last operation: literals only, no match
            return bytes(out)
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = payload[pos] | (payload[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: match offset out of range")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = payload[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        if len(out) + match_len > max_output:
            raise ValueError("lz4: output exceeds decoder limit")
        if offset >= match_len:  # non-overlapping fast path
            start = len(out) - offset
            out += out[start : start + match_len]
        else:
            for _ in range(match_len):
                out.append(out[-offset])
