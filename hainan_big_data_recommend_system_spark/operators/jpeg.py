"""Pure-Python baseline-sequential JPEG codec (round 5) — the last image
format on the real-decode ladder (operators/multimodal.py: BMP header
parse, PNG chunk/inflate/unfilter, now JPEG entropy decode + IDCT).

Scope (documented, enforced): baseline sequential DCT (SOF0) AND
progressive DCT (SOF2, round 6 — spectral selection + successive
approximation in full: DC first/refine, AC first with EOB-run codes,
AC refinement with correction bits), 8-bit samples, 1 component
(grayscale) or 3 components with sampling factors h,v <= 2 per
component — which covers 4:4:4, 4:2:2 and the 4:2:0 layout ~90% of
real-world JPEGs use (round 6; r5 rejected anything but 4:4:4) —
restart intervals in sequential streams (DRI + RSTn markers:
byte-aligned resync points that reset DC prediction, round 6; out of
scope inside progressive scans), no arithmetic coding, no hierarchical
mode.  Everything inside that scope is REAL:

- marker walk (SOI/APP/DQT/SOF0/DHT/SOS/EOI) with length validation;
- quantization + Huffman tables parsed from the FILE's own DQT/DHT
  segments (canonical code reconstruction per ITU-T T.81 §C.2), so the
  decoder handles any compliant baseline stream in scope, not just this
  encoder's output;
- entropy decode: DC category + EXTEND, AC run/size with ZRL and EOB,
  0xFF00 byte-unstuffing, interleaved MCU walk over per-component
  (h_i, v_i) data units (T.81 §A.2.3) for any factors <= 2;
- dequantize → inverse zigzag → float IDCT (numpy, separable 8×8
  transform matrix) → level shift → nearest-neighbor chroma upsample to
  the luma grid → clamp → YCbCr→RGB (JFIF/BT.601).

The encoder (`make_jpeg`) is the matching fixture generator, same
contract as make_bmp/make_png: a pure function of (width, height,
pixel_seed) whose raw RGB stream is the seed cycled to w·h·3 bytes.
With the default flat quantization tables the DCT roundtrip is nearly
lossless, so tests pin a small max-abs pixel error instead of a digest
(IDCT rounding makes bit-exact cross-library pins brittle; dimensions
and channel count ARE pinned exactly by the DuckDB oracle in
qcatalog/textstats.py: multimodal_meta).

No reference analogue (the reference has no image pipeline); public
knowledge: ITU-T T.81 (JPEG), JFIF 1.02.
"""

from __future__ import annotations

import math
import struct

# zigzag scan order (T.81 Figure A.6): index i of the scan -> (row, col)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Generic Huffman code-length counts + symbol lists (Annex K shape): the
# DC tables cover categories 0-11, the AC tables every (run, size)
# symbol incl. ZRL/EOB.  The decoder never assumes these — it rebuilds
# whatever canonical tables the stream's DHT declares.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

def _ac_table() -> tuple[list[int], list[int]]:
    """Canonical AC table covering all 162 baseline AC symbols: EOB, ZRL,
    and (run 0-15) x (size 1-10).  Built as a fixed-length canonical code
    (all symbols at 9 bits, reserving the all-ones prefix) — legal per
    T.81 §C.2 (any prefix-free code listed by length works) and trivially
    self-consistent between this encoder and any table-driven decoder."""
    symbols = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    bits = [0] * 16
    bits[8] = len(symbols)  # all codes 9 bits long (bits[i] = count of i+1)
    return bits, symbols

_AC_BITS, _AC_VALS = _ac_table()

# flat quality-100-style quantization tables: DCT roundtrip error stays
# within a few counts, which is what lets tests pin a tight tolerance
_QUANT_LUMA = [1] * 64
_QUANT_CHROMA = [1] * 64


def _dct_matrix():
    import numpy as np

    m = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return m


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per T.81 §C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 §B.1.1.5)
                self.out.append(0x00)

    def restart_marker(self, m: int) -> None:
        """Byte-align (1-bit padding) and emit a bare RSTm marker —
        never byte-stuffed (T.81 §B.2.1.2: markers stand outside the
        entropy-coded segments they delimit)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted mid-block")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1  # skip stuffed 0x00
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        # hot path (one call per nonzero coefficient): same semantics as
        # n read_bit() calls — incl. 0xFF00 unstuffing and exhaustion
        # errors — with the loop state held in locals
        acc, nbits, pos = self.acc, self.nbits, self.pos
        data = self.data
        ln = len(data)
        v = 0
        for _ in range(n):
            if nbits == 0:
                if pos >= ln:
                    raise ValueError("entropy stream exhausted mid-block")
                b = data[pos]
                pos += 1
                if b == 0xFF:
                    if pos >= ln or data[pos] != 0x00:
                        raise ValueError(
                            "unexpected marker inside entropy data"
                        )
                    pos += 1
                acc = b
                nbits = 8
            nbits -= 1
            v = (v << 1) | ((acc >> nbits) & 1)
        self.acc, self.nbits, self.pos = acc, nbits, pos
        return v

    def expect_restart(self, m: int) -> None:
        """Consume the byte-aligned RSTm marker that must sit here
        (T.81 §E.2.4): discard the current byte's padding bits, then
        require exactly FF D(m&7) — a missing or out-of-sequence marker
        means the stream lost sync and decoding must stop loudly."""
        self.nbits = 0  # drop pad bits; markers are byte-aligned
        # optional 0xFF fill bytes may pad before the marker (§B.1.1.2):
        # skip leading FFs that are followed by another FF — the final
        # FF of the run is the marker's own prefix byte
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (m & 7)
        ):
            got = self.data[self.pos : self.pos + 2].hex() or "EOF"
            raise ValueError(
                f"expected restart marker RST{m & 7} at byte {self.pos}, "
                f"found {got}"
            )
        self.pos += 2


def _category(v: int) -> int:
    return abs(v).bit_length()


def _extend(d: int, t: int) -> int:
    """T.81 EXTEND: map t received bits back to the signed value."""
    if t == 0:
        return 0
    return d if d >= (1 << (t - 1)) else d - (1 << t) + 1


def _rgb_to_ycbcr(rgb):
    import numpy as np

    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc):
    import numpy as np

    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _edge_pad(plane, ph: int, pw: int):
    """Pad a (h, w[, c]) array to (ph, pw[, c]) by edge replication
    (keeps boundary DCT tame)."""
    import numpy as np

    h, w = plane.shape[0], plane.shape[1]
    padded = np.empty((ph, pw) + plane.shape[2:], dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h]
    padded[:, w:] = padded[:, w - 1 : w]
    return padded


def make_jpeg(
    width: int,
    height: int,
    pixel_seed: bytes,
    gray: bool = False,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a VALID baseline-sequential JFIF JPEG (single-component
    grayscale with ``gray=True``, else YCbCr — 4:4:4 by default, or the
    in-the-wild-dominant 4:2:0 with ``subsampling="420"``: luma at
    sampling factors h=v=2, chroma 2×2-box-averaged to half resolution,
    interleaved 16×16 MCUs of 4 Y + 1 Cb + 1 Cr data units per T.81
    §A.2.3; flat quant tables) whose raw RGB stream is ``pixel_seed``
    cycled to ``width·height·3`` bytes — the same seed convention as
    make_bmp / make_png, so fixtures need no image assets.
    ``restart_interval=N`` emits a DRI segment and a byte-aligned RSTn
    marker (cycling 0-7, DC predictors reset) after every N MCUs — the
    T.81 error-resilience feature."""
    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if restart_interval < 0:
        raise ValueError(f"bad restart interval {restart_interval}")
    seed = pixel_seed or b"\x00"
    n = width * height * 3
    reps = -(-n // len(seed))
    raw = (seed * reps)[:n]
    rgb = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(rgb)
    ncomp = 1 if gray else 3
    sub420 = (not gray) and subsampling == "420"

    m = _dct_matrix()
    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_codes = _build_codes(_AC_BITS, _AC_VALS)
    quants = [_QUANT_LUMA, _QUANT_CHROMA]
    w = _BitWriter()
    pred = [0, 0, 0]

    def quantize_plane(plane, comp: int):
        """All 8×8 blocks of a (H, W) plane → per-block zigzag-ordered
        quantized coefficient lists, batched through one numpy DCT pass
        (the per-block Python list comprehension dominated fixture
        generation).  Returns a (bh, bw) nested list of 64-int lists in
        block-raster order."""
        import numpy as np

        q = np.array(quants[0 if comp == 0 else 1], dtype=np.float64)
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        )
        coef = np.matmul(np.matmul(m, blocks), m.T)
        zz = np.rint(
            coef.reshape(bh, bw, 64)[..., ZIGZAG] / q
        ).astype(np.int64)
        return zz.tolist()

    def emit_block(zz, comp: int) -> None:
        diff = zz[0] - pred[comp]
        pred[comp] = zz[0]
        t = _category(diff)
        code, length = dc_codes[t]
        w.write(code, length)
        if t:
            w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, last_nz + 1):
            if zz[i] == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                w.write(code, length)
                run -= 16
            t = _category(zz[i])
            code, length = ac_codes[(run << 4) | t]
            w.write(code, length)
            w.write(zz[i] if zz[i] > 0 else zz[i] + (1 << t) - 1, t)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            w.write(code, length)

    if not sub420:
        total_mcus = (-(-width // 8)) * (-(-height // 8))
    else:
        total_mcus = (-(-width // 16)) * (-(-height // 16))
    mcu_i = 0

    def mcu_done() -> None:
        nonlocal mcu_i
        mcu_i += 1
        if (
            restart_interval
            and mcu_i % restart_interval == 0
            and mcu_i < total_mcus
        ):
            w.restart_marker(mcu_i // restart_interval - 1)
            pred[0] = pred[1] = pred[2] = 0

    if not sub420:
        # one 8x8 data unit per component per MCU (all factors 1x1)
        bw, bh = -(-width // 8), -(-height // 8)
        padded = _edge_pad(ycc, bh * 8, bw * 8)
        zzc = [quantize_plane(padded[..., c], c) for c in range(ncomp)]
        for by in range(bh):
            for bx in range(bw):
                for comp in range(ncomp):
                    emit_block(zzc[comp][by][bx], comp)
                mcu_done()
        comp_hv = [0x11] * ncomp
    else:
        # 16x16 MCU: 4 luma blocks (raster order) + 1 Cb + 1 Cr
        mcux, mcuy = -(-width // 16), -(-height // 16)
        padded = _edge_pad(ycc, mcuy * 16, mcux * 16)
        yzz = quantize_plane(padded[..., 0], 0)
        # 2x2 box average -> half-resolution chroma planes (mcuy*8 x mcux*8)
        czz = [
            quantize_plane(
                padded[..., c]
                .reshape(mcuy * 8, 2, mcux * 8, 2)
                .mean(axis=(1, 3)),
                c,
            )
            for c in (1, 2)
        ]
        for my in range(mcuy):
            for mx in range(mcux):
                for vy in range(2):
                    for hx in range(2):
                        emit_block(yzz[my * 2 + vy][mx * 2 + hx], 0)
                for c in (0, 1):
                    emit_block(czz[c][my][mx], c + 1)
                mcu_done()
        comp_hv = [0x22, 0x11, 0x11]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(quants[: 1 if gray else 2]):
        out += _seg(0xDB, bytes([tid]) + bytes(q[i] for i in range(64)))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for cid in range(ncomp):
        sof += bytes([cid + 1, comp_hv[cid], 0 if cid == 0 else 1])
    out += _seg(0xC0, sof)
    tables = [(0, 0, _DC_BITS, _DC_VALS), (1, 0, _AC_BITS, _AC_VALS)]
    if not gray:
        tables += [(0, 1, _DC_BITS, _DC_VALS), (1, 1, _AC_BITS, _AC_VALS)]
    for tc, tid, bits, vals in tables:
        out += _seg(0xC4, bytes([(tc << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for cid in range(ncomp):
        td_ta = 0x00 if cid == 0 else 0x11
        sos += bytes([cid + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _HuffDecoder:
    """Canonical-code decoder: walk bits, match against per-length first
    codes (T.81 Figure F.16 DECODE procedure)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, r: _BitReader) -> int:
        # hot path (one call per DC diff + per AC run/size symbol): the
        # bit loop of read_bit() inlined with local state — identical
        # semantics including unstuffing and exhaustion errors
        acc, nbits, pos = r.acc, r.nbits, r.pos
        data = r.data
        ln = len(data)
        maxcode, mincode = self.maxcode, self.mincode
        code = 0
        for length in range(1, 17):
            if nbits == 0:
                if pos >= ln:
                    raise ValueError("entropy stream exhausted mid-block")
                b = data[pos]
                pos += 1
                if b == 0xFF:
                    if pos >= ln or data[pos] != 0x00:
                        raise ValueError(
                            "unexpected marker inside entropy data"
                        )
                    pos += 1
                acc = b
                nbits = 8
            nbits -= 1
            code = (code << 1) | ((acc >> nbits) & 1)
            if maxcode[length] >= code >= mincode[length]:
                r.acc, r.nbits, r.pos = acc, nbits, pos
                return self.vals[self.valptr[length] + code - mincode[length]]
        raise ValueError("invalid Huffman code in entropy stream")


def parse_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline-sequential JPEG: returns ``(width, height,
    channels, pixel bytes)`` — interleaved RGB8 for 3-component streams,
    gray8 for 1-component.  Sampling factors h,v <= 2 per component are
    fully decoded (4:4:4 / 4:2:2 / 4:2:0): the interleaved MCU walk reads
    h_i·v_i data units per component per MCU (T.81 §A.2.3) and subsampled
    planes are nearest-neighbor upsampled to the luma grid before color
    conversion.  Restart intervals are honored (round 6): a DRI of N
    requires a byte-aligned RSTn marker (cycling 0-7) after every N MCUs,
    resetting DC prediction — a missing/out-of-sequence marker is a lost
    stream and raises.  Raises ``ValueError`` on anything outside the
    documented scope (progressive, factors > 2, 12-bit, arithmetic) or
    malformed (bad lengths, undefined tables, truncated entropy data) —
    a decode stage must reject corrupt payloads loudly, never emit
    garbage pixels.
    """
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None  # (w, h, [(cid, h, v, qid)])
    scan = None  # ([(cid, dc_tid, ac_tid)], entropy_start)
    restart_interval = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / bare RSTn
            continue
        if pos + 2 > len(payload):
            raise ValueError("truncated segment header")
        seglen = struct.unpack_from(">H", payload, pos)[0]
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError(f"bad segment length {seglen} at offset {pos}")
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if p + 65 > len(body):
                    raise ValueError("truncated DQT")
                quant[tq] = list(body[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                if p + 17 + nv > len(body):
                    raise ValueError("truncated DHT")
                vals = list(body[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("truncated SOF0")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF0 component list")
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, qid = body[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                if ch not in (1, 2) or cv not in (1, 2):
                    raise ValueError(
                        f"sampling factors unsupported (h={ch}, v={cv}; "
                        "baseline scope is h,v <= 2)"
                    )
                comps.append((cid, ch, cv, qid))
            if nc == 1:
                # single-component scans are non-interleaved (T.81
                # §A.2.2): one data unit per 8x8 region regardless of
                # declared factors
                cid, _, _, qid = comps[0]
                comps = [(cid, 1, 1, qid)]
            if w <= 0 or h <= 0:
                raise ValueError(f"bad dimensions {w}x{h}")
            frame = (w, h, comps)
        elif marker == 0xC2:
            # progressive DCT: multi-scan coefficient accumulation — a
            # different decode discipline entirely (spectral selection +
            # successive approximation); handled by the dedicated walker
            return _parse_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI")
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if not body or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("truncated SOS")
            ns = body[0]
            stabs = []
            for i in range(ns):
                cid, tds = body[1 + 2 * i : 3 + 2 * i]
                stabs.append((cid, tds >> 4, tds & 0xF))
            scan = (stabs, pos + seglen)
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF0 or SOS segment")
    w, h, comps = frame
    stabs, epos = scan
    if len(stabs) != len(comps):
        raise ValueError("scan component count != frame component count")

    # locate EOI: entropy data runs to the final FFD9 (stuffed FF00 and
    # RSTn bytes are handled by the bit reader / rejected via DRI)
    end = payload.rfind(b"\xff\xd9")
    if end < epos:
        raise ValueError("missing EOI after entropy data")
    reader = _BitReader(payload[epos:end])

    qtabs = []
    decs = []
    order = {cid: i for i, (cid, _, _) in enumerate(stabs)}
    for cid, ch, cv, qid in comps:
        if qid not in quant:
            raise ValueError(f"component references undefined DQT {qid}")
        if cid not in order:
            raise ValueError(f"component {cid} missing from scan")
        _, td, ta = stabs[order[cid]]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("scan references undefined DHT")
        qtabs.append(np.array(quant[qid], dtype=np.float64))
        decs.append((huff[(0, td)], huff[(1, ta)]))

    m = _dct_matrix()
    nc = len(comps)
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [
        np.empty((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
        for _, ch, cv, _ in comps
    ]
    pred = [0] * nc

    def decode_block(ci: int):
        dc_dec, ac_dec = decs[ci]
        zz = [0] * 64
        t = dc_dec.decode(reader)
        if t > 11:
            raise ValueError(f"DC category {t} out of range")
        diff = _extend(reader.read_bits(t), t) if t else 0
        pred[ci] += diff
        zz[0] = pred[ci]
        i = 1
        while i < 64:
            rs = ac_dec.decode(reader)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    i += 16
                    continue
                break  # EOB
            i += r
            if i > 63:
                raise ValueError("AC run past end of block")
            zz[i] = _extend(reader.read_bits(s), s)
            i += 1
        coef = np.zeros((8, 8), dtype=np.float64)
        for i, zi in enumerate(ZIGZAG):
            coef[zi // 8, zi % 8] = zz[i] * qtabs[ci][i]
        return m.T @ coef @ m + 128.0

    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_, ch, cv, _) in enumerate(comps):
                for vy in range(cv):
                    for hx in range(ch):
                        r0 = (my * cv + vy) * 8
                        c0 = (mx * ch + hx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = decode_block(ci)
            mcu_i += 1
            if (
                restart_interval
                and mcu_i % restart_interval == 0
                and mcu_i < mcux * mcuy
            ):
                # byte-aligned resync point: the matching RSTn (cycling
                # 0-7) must sit exactly here, and DC prediction restarts
                reader.expect_restart(mcu_i // restart_interval - 1)
                pred = [0] * nc
    # T.81 pads the final partial byte with 1-bits AND allows optional
    # 0xFF fill bytes before any marker (§B.1.1.2) — some encoders emit
    # them before EOI (ADVICE r6: rejecting them quarantined compliant
    # streams).  Consume the pad bits and any pure-0xFF fill run; only
    # real unread entropy bytes mean the declared sampling geometry does
    # not match the stream (e.g. a 4:4:4 stream relabeled 4:2:0) —
    # reject rather than emit garbage pixels.
    tail = reader.pos
    while tail < len(reader.data) and reader.data[tail] == 0xFF:
        tail += 1
    if tail < len(reader.data):
        raise ValueError(
            f"{len(reader.data) - reader.pos} trailing entropy bytes after "
            "final MCU — stream inconsistent with frame sampling geometry"
        )

    # upsample subsampled planes to the luma grid (nearest-neighbor:
    # factors are 1 or 2, both exact divisors of hmax/vmax) and crop
    cropped = np.empty((h, w, nc), dtype=np.float64)
    for ci, (_, ch, cv, _) in enumerate(comps):
        p = planes[ci]
        if cv != vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        if ch != hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        cropped[..., ci] = p[:h, :w]
    if nc == 3:
        pixels = _ycbcr_to_rgb(cropped).tobytes()
    else:
        pixels = (
            np.clip(np.round(cropped[..., 0]), 0, 255).astype(np.uint8).tobytes()
        )
    return w, h, nc, pixels


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2) — round 6.  The other big in-the-wild format gap
# after 4:2:0 (VERDICT r5 "What's missing" #1 named both): web-optimized
# images ship progressive streams, where coefficients arrive over multiple
# scans (spectral selection: DC and AC bands separately; successive
# approximation: high-order bits first, refinement bits later) and the
# image is only reconstructable after accumulating them.
#
# Decoder scope: spectral selection + successive approximation in full —
# DC first/refine scans (interleaved or single-component), AC first scans
# with EOB-run codes (EOBn), AC refinement scans with correction bits —
# for the same geometry envelope as the sequential path (8-bit, 1 or 3
# components, factors <= 2).  Restart intervals inside progressive scans
# are out of scope (DRI != 0 raises).  The fixture encoder emits a
# 4-phase scan script (DC Al=1 -> DC refine -> per-component AC Al=1 ->
# per-component AC refine), exercising every decoder code path; because
# both coders quantize identically, a progressive decode must produce
# BIT-IDENTICAL pixels to the sequential decode of the same source —
# which is exactly what tests pin.
#
# Public knowledge: ITU-T T.81 Annex G; the EOB-run and refinement
# algorithms follow the spec's G.1.2.2-G.1.2.3 procedures.
# ---------------------------------------------------------------------------

def _ac_prog_table() -> tuple[list[int], list[int]]:
    """Canonical AC table for progressive scans: all 176 legal symbols —
    EOBn (n 0-14), ZRL, and (run 0-15) x (size 1-10) — at 9 bits each
    (legal per T.81 C.2, same construction as the sequential table)."""
    symbols = [n << 4 for n in range(15)] + [0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    bits = [0] * 16
    bits[8] = len(symbols)
    return bits, symbols


_AC_PROG_BITS, _AC_PROG_VALS = _ac_prog_table()


def _quantize_grid(plane, q, m):
    """All 8x8 blocks of a (H, W) plane -> (bh, bw) nested lists of
    64-int zigzag-ordered quantized coefficients (same math as the
    sequential encoder's batched pass)."""
    import numpy as np

    qv = np.array(q, dtype=np.float64)
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.matmul(np.matmul(_dct_matrix(), blocks), _dct_matrix().T)
    return np.rint(coef.reshape(bh, bw, 64)[..., ZIGZAG] / qv).astype(
        np.int64
    ).tolist()


def make_progressive_jpeg(
    width: int,
    height: int,
    pixel_seed: bytes,
    gray: bool = False,
    subsampling: str = "444",
) -> bytes:
    """Encode a VALID progressive JFIF JPEG (SOF2) with the 4-phase scan
    script described in the module section above; same seed/pixel
    contract as :func:`make_jpeg`."""
    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    seed = pixel_seed or b"\x00"
    n = width * height * 3
    raw = (seed * (-(-n // len(seed))))[:n]
    rgb = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(rgb)
    ncomp = 1 if gray else 3
    sub420 = (not gray) and subsampling == "420"
    m = _dct_matrix()  # noqa: F841  (used via _quantize_grid)
    quants = [_QUANT_LUMA, _QUANT_CHROMA]

    if sub420:
        hvs = [(2, 2), (1, 1), (1, 1)]
        mcux, mcuy = -(-width // 16), -(-height // 16)
        padded = _edge_pad(ycc, mcuy * 16, mcux * 16)
        grids = [
            _quantize_grid(padded[..., 0], quants[0], m),
            _quantize_grid(
                padded[..., 1].reshape(mcuy * 8, 2, mcux * 8, 2).mean(
                    axis=(1, 3)
                ),
                quants[1],
                m,
            ),
            _quantize_grid(
                padded[..., 2].reshape(mcuy * 8, 2, mcux * 8, 2).mean(
                    axis=(1, 3)
                ),
                quants[1],
                m,
            ),
        ]
        comp_dims = [(width, height), (-(-width // 2), -(-height // 2)),
                     (-(-width // 2), -(-height // 2))]
    else:
        hvs = [(1, 1)] * ncomp
        mcux, mcuy = -(-width // 8), -(-height // 8)
        padded = _edge_pad(ycc, mcuy * 8, mcux * 8)
        grids = [
            _quantize_grid(padded[..., c], quants[0 if c == 0 else 1], m)
            for c in range(ncomp)
        ]
        comp_dims = [(width, height)] * ncomp
    # non-interleaved (per-component) block grids for AC scans
    nbw = [-(-cw // 8) for cw, _ in comp_dims]
    nbh = [-(-ch // 8) for _, ch in comp_dims]

    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_codes = _build_codes(_AC_PROG_BITS, _AC_PROG_VALS)

    def dc_blocks_interleaved():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hh, vv = hvs[ci]
                    for vy in range(vv):
                        for hx in range(hh):
                            yield ci, grids[ci][my * vv + vy][mx * hh + hx]

    def dc_first(al: int) -> bytes:
        w = _BitWriter()
        pred = [0] * ncomp
        for ci, zz in dc_blocks_interleaved():
            dc = zz[0] >> al  # arithmetic shift (T.81 DC point transform)
            diff = dc - pred[ci]
            pred[ci] = dc
            t = _category(diff)
            code, length = dc_codes[t]
            w.write(code, length)
            if t:
                w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        return w.flush()

    def dc_refine(al: int) -> bytes:
        w = _BitWriter()
        for _, zz in dc_blocks_interleaved():
            w.write((zz[0] >> al) & 1, 1)
        return w.flush()

    def ac_first(ci: int, al: int) -> bytes:
        w = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nn = eobrun.bit_length() - 1
                code, length = ac_codes[nn << 4]
                w.write(code, length)
                if nn:
                    w.write(eobrun - (1 << nn), nn)
                eobrun = 0

        for row in range(nbh[ci]):
            for col in range(nbw[ci]):
                zz = grids[ci][row][col]
                band = [
                    (abs(v) >> al) * (1 if v > 0 else -1) for v in zz[1:]
                ]
                last = max((i for i, v in enumerate(band) if v), default=-1)
                if last < 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for i in range(last + 1):
                    v = band[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_codes[0xF0]
                        w.write(code, length)
                        run -= 16
                    s = _category(v)
                    code, length = ac_codes[(run << 4) | s]
                    w.write(code, length)
                    w.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 62:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        return w.flush()

    def ac_refine(ci: int, ah: int, al: int) -> bytes:
        w = _BitWriter()
        eobrun = 0
        pend: list[int] = []

        def emit_pending():
            nonlocal pend
            for b in pend:
                w.write(b, 1)
            pend = []

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nn = eobrun.bit_length() - 1
                code, length = ac_codes[nn << 4]
                w.write(code, length)
                if nn:
                    w.write(eobrun - (1 << nn), nn)
                eobrun = 0
            emit_pending()

        for row in range(nbh[ci]):
            for col in range(nbw[ci]):
                zz = grids[ci][row][col]
                hist = [abs(v) >> ah for v in zz[1:]]
                cur = [abs(v) >> al for v in zz[1:]]
                eob = max(
                    (i for i in range(63) if hist[i] == 0 and cur[i] != 0),
                    default=-1,
                )
                if eob < 0:
                    for i in range(63):
                        if hist[i] != 0:
                            pend.append(cur[i] & 1)
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for i in range(eob + 1):
                    if hist[i] == 0 and cur[i] == 0:
                        run += 1
                        continue
                    # nonzero at this level: a pending >15 zero-run must
                    # drain NOW (T.81 G.1.2.3 / the libjpeg discipline),
                    # so that buffered correction bits land after the
                    # ZRL covering the positions they belong to — the
                    # decoder reads them while walking the skip
                    while run > 15:
                        code, length = ac_codes[0xF0]
                        w.write(code, length)
                        emit_pending()
                        run -= 16
                    if hist[i] != 0:
                        pend.append(cur[i] & 1)
                        continue
                    # newly significant: magnitude 1 at this level
                    code, length = ac_codes[(run << 4) | 1]
                    w.write(code, length)
                    w.write(1 if zz[1 + i] > 0 else 0, 1)
                    emit_pending()
                    run = 0
                if eob < 62:
                    # the band ends before Se: the decoder will decode
                    # one more symbol inside this block, so it must join
                    # the EOB run (with its tail corrections buffered).
                    # A band coded exactly to Se leaves the decoder's
                    # block loop with no further symbol read — counting
                    # it here would desynchronize every later block.
                    for i in range(eob + 1, 63):
                        if hist[i] != 0:
                            pend.append(cur[i] & 1)
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        return w.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(quants[: 1 if gray else 2]):
        out += _seg(0xDB, bytes([tid]) + bytes(q[i] for i in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for cid in range(ncomp):
        hh, vv = hvs[cid]
        sof += bytes([cid + 1, (hh << 4) | vv, 0 if cid == 0 else 1])
    out += _seg(0xC2, sof)  # SOF2: progressive DCT
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(
        0xC4, bytes([0x10]) + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS)
    )

    def sos(comp_ids, ss, se, ah, al, entropy: bytes) -> bytes:
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid + 1, 0x00])  # Td=0, Ta=0
        hdr += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, hdr) + entropy

    all_ids = list(range(ncomp))
    out += sos(all_ids, 0, 0, 0, 1, dc_first(1))
    out += sos(all_ids, 0, 0, 1, 0, dc_refine(0))
    for ci in range(ncomp):
        out += sos([ci], 1, 63, 0, 1, ac_first(ci, 1))
    for ci in range(ncomp):
        out += sos([ci], 1, 63, 1, 0, ac_refine(ci, 1, 0))
    out += b"\xff\xd9"
    return bytes(out)


def _parse_progressive(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a progressive (SOF2) JPEG: walk every scan, accumulate
    coefficients per T.81 Annex G (DC first/refine, AC first with EOB
    runs, AC refine with correction bits), then dequantize + IDCT once.
    Same return contract and strictness as :func:`parse_jpeg`."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None  # (w, h, [(cid, h, v, qid)])
    scans = []  # (scomps=[(ci, dc_dec|None, ac_dec|None)], ss, se, ah, al, data)
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            raise ValueError("bare restart marker outside a scan")
        if pos + 2 > len(payload):
            raise ValueError("truncated segment header")
        seglen = struct.unpack_from(">H", payload, pos)[0]
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError(f"bad segment length {seglen} at offset {pos}")
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if p + 65 > len(body):
                    raise ValueError("truncated DQT")
                quant[tq] = list(body[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                if p + 17 + nv > len(body):
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _HuffDecoder(
                    bits, list(body[p + 17 : p + 17 + nv])
                )
                p += 17 + nv
        elif marker == 0xC2:  # SOF2
            if frame is not None:
                raise ValueError("multiple SOF segments")
            if len(body) < 6:
                raise ValueError("truncated SOF2")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF2 component list")
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, qid = body[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                if ch not in (1, 2) or cv not in (1, 2):
                    raise ValueError(
                        f"sampling factors unsupported (h={ch}, v={cv})"
                    )
                comps.append((cid, ch, cv, qid))
            if nc == 1:
                cid, _, _, qid = comps[0]
                comps = [(cid, 1, 1, qid)]
            if w <= 0 or h <= 0:
                raise ValueError(f"bad dimensions {w}x{h}")
            frame = (w, h, comps)
        elif marker == 0xC0:
            raise ValueError("baseline SOF0 in progressive walker")
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI")
            if struct.unpack_from(">H", body, 0)[0] != 0:
                raise ValueError(
                    "restart intervals inside progressive scans unsupported"
                )
        elif marker == 0xDA:  # SOS — one of possibly many
            if frame is None:
                raise ValueError("SOS before SOF2")
            if not body or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("truncated SOS")
            ns = body[0]
            order = {cid: i for i, (cid, _, _, _) in enumerate(frame[2])}
            scomps = []
            for i in range(ns):
                cid, tds = body[1 + 2 * i : 3 + 2 * i]
                if cid not in order:
                    raise ValueError(f"scan component {cid} not in frame")
                td, ta = tds >> 4, tds & 0xF
                scomps.append((order[cid], td, ta))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not (0 <= ss <= se <= 63):
                raise ValueError(f"bad spectral range {ss}..{se}")
            if ss == 0 and se != 0:
                raise ValueError("progressive scan mixing DC and AC bands")
            if ss > 0 and ns != 1:
                raise ValueError("progressive AC scan must be single-component")
            # capture table objects NOW (DHT may be redefined between scans)
            resolved = []
            for ci, td, ta in scomps:
                dc_dec = huff.get((0, td))
                ac_dec = huff.get((1, ta))
                if ss == 0 and ah == 0 and dc_dec is None:
                    raise ValueError("DC scan references undefined DHT")
                if ss > 0 and ac_dec is None:
                    raise ValueError("AC scan references undefined DHT")
                resolved.append((ci, dc_dec, ac_dec))
            epos = pos + seglen
            j = epos
            n = len(payload)
            while j + 1 < n:
                if payload[j] == 0xFF and payload[j + 1] != 0x00:
                    break
                j += 1
            else:
                raise ValueError("entropy data runs past end of payload")
            scans.append((resolved, ss, se, ah, al, payload[epos:j]))
            pos = j
            continue
        pos += seglen
    if frame is None or not scans:
        raise ValueError("missing SOF2 or SOS segment")

    w, h, comps = frame
    nc = len(comps)
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # full interleaved grid per component; AC (non-interleaved) scans
    # cover the ceil(comp_dim/8) prefix of it
    coefs = [
        np.zeros((mcuy * cv * 8 // 8, mcux * ch * 8 // 8, 64), dtype=np.int64)
        for _, ch, cv, _ in comps
    ]
    # non-interleaved (single-component-scan) data-unit grids: blocks of
    # ceil(comp_dim / 8) where comp_dim = ceil(frame_dim * factor / max)
    nbw = [
        -(-cw // 8) for cw in (-(-w * ch // hmax) for _, ch, _, _ in comps)
    ]
    nbh = [
        -(-chh // 8) for chh in (-(-h * cv // vmax) for _, _, cv, _ in comps)
    ]

    for resolved, ss, se, ah, al, data in scans:
        reader = _BitReader(data)
        if ss == 0:
            _decode_dc_scan(
                reader, resolved, comps, coefs, mcux, mcuy, ah, al, nbw, nbh
            )
        else:
            ci, _, ac_dec = resolved[0]
            _decode_ac_scan(
                reader, ac_dec, coefs[ci], nbh[ci], nbw[ci], ss, se, ah, al
            )
        if reader.pos < len(data):
            raise ValueError(
                f"{len(data) - reader.pos} trailing entropy bytes after "
                "final data unit of a progressive scan"
            )

    # reconstruction: dequantize + inverse zigzag + batched IDCT
    m = _dct_matrix()
    zig = np.array(ZIGZAG)
    planes = []
    for ci, (_, ch, cv, qid) in enumerate(comps):
        if qid not in quant:
            raise ValueError(f"component references undefined DQT {qid}")
        q = np.array(quant[qid], dtype=np.float64)
        rows, cols, _ = coefs[ci].shape
        nat = np.zeros((rows, cols, 64), dtype=np.float64)
        nat[..., zig] = coefs[ci] * q
        blocks = nat.reshape(rows, cols, 8, 8)
        out = np.matmul(np.matmul(m.T, blocks), m) + 128.0
        planes.append(out.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8))
    cropped = np.empty((h, w, nc), dtype=np.float64)
    for ci, (_, ch, cv, _) in enumerate(comps):
        p = planes[ci]
        if cv != vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        if ch != hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        cropped[..., ci] = p[:h, :w]
    if nc == 3:
        pixels = _ycbcr_to_rgb(cropped).tobytes()
    else:
        pixels = (
            np.clip(np.round(cropped[..., 0]), 0, 255).astype(np.uint8).tobytes()
        )
    return w, h, nc, pixels


def _decode_dc_scan(reader, resolved, comps, coefs, mcux, mcuy, ah, al,
                    nbw, nbh) -> None:
    """DC band scan (Ss=Se=0): first pass (Ah=0) Huffman-decodes DIFF
    values into ``pred << Al``; refinement (Ah>0) reads one bit per data
    unit and ORs it at Al.  Interleaved when the scan holds multiple
    components, non-interleaved (component raster) when single."""
    if len(resolved) > 1:
        pred = [0] * len(resolved)

        def units():
            for my in range(mcuy):
                for mx in range(mcux):
                    for si, (ci, _, _) in enumerate(resolved):
                        _, ch, cv, _ = comps[ci]
                        for vy in range(cv):
                            for hx in range(ch):
                                yield si, ci, my * cv + vy, mx * ch + hx
    else:
        pred = [0]
        ci0 = resolved[0][0]

        def units():
            for r in range(nbh[ci0]):
                for c in range(nbw[ci0]):
                    yield 0, ci0, r, c

    if ah == 0:
        for si, ci, r, c in units():
            dc_dec = resolved[si][1]
            t = dc_dec.decode(reader)
            if t > 11:
                raise ValueError(f"DC category {t} out of range")
            diff = _extend(reader.read_bits(t), t) if t else 0
            pred[si] += diff
            coefs[ci][r, c, 0] = pred[si] << al
    else:
        p1 = 1 << al
        for si, ci, r, c in units():
            if reader.read_bit():
                coefs[ci][r, c, 0] |= p1


def _decode_ac_scan(reader, ac_dec, grid, rows, cols, ss, se, ah, al) -> None:
    """AC band scan over one component's non-interleaved data units.

    First pass (Ah=0): run/size symbols with EOBn end-of-band runs —
    ``EOBRUN = (1 << n) + extension`` blocks whose remaining band is
    all-zero.  Refinement (Ah>0): T.81 G.1.2.3 — newly-significant
    coefficients arrive as ±1 at Al with zero-HISTORY run lengths, and
    every already-nonzero coefficient passed on the way (including
    inside EOB runs and ZRL skips) consumes one correction bit."""
    eobrun = 0
    p1 = 1 << al
    m1 = -(1 << al)
    for r in range(rows):
        for c in range(cols):
            zz = grid[r, c]
            if ah == 0:
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = ac_dec.decode(reader)
                    rr, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if rr == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << rr) - 1
                        if rr:
                            eobrun += reader.read_bits(rr)
                        break  # current block's band ends here
                    k += rr
                    if k > se:
                        raise ValueError("AC run past end of band")
                    zz[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
            else:
                if eobrun > 0:
                    for k in range(ss, se + 1):
                        v = int(zz[k])
                        if v != 0 and reader.read_bit():
                            if (abs(v) & p1) == 0:
                                zz[k] = v + (p1 if v > 0 else m1)
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = ac_dec.decode(reader)
                    rr, s = rs >> 4, rs & 0xF
                    newval = 0
                    if s == 0:
                        if rr < 15:
                            # FULL run count here: the post-loop below
                            # consumes the current block's tail
                            # corrections and decrements for it
                            eobrun = 1 << rr
                            if rr:
                                eobrun += reader.read_bits(rr)
                            break
                        # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "AC refinement coefficient with size != 1"
                            )
                        newval = p1 if reader.read_bit() else m1
                    while k <= se:
                        v = int(zz[k])
                        if v != 0:
                            if reader.read_bit():
                                if (abs(v) & p1) == 0:
                                    zz[k] = v + (p1 if v > 0 else m1)
                        else:
                            rr -= 1
                            if rr < 0:
                                break
                        k += 1
                    if newval and k <= se:
                        zz[k] = newval
                    elif newval:
                        raise ValueError("newly significant AC past band end")
                    k += 1
                # consume correction bits after an end-of-band break
                if eobrun > 0:
                    for kk in range(k, se + 1):
                        v = int(zz[kk])
                        if v != 0 and reader.read_bit():
                            if (abs(v) & p1) == 0:
                                zz[kk] = v + (p1 if v > 0 else m1)
                    eobrun -= 1
    if eobrun != 0:
        raise ValueError("EOB run extends past the last data unit")
