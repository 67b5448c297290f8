"""JPEG codec (baseline + progressive) — pure numpy + stdlib.

Implements the ITU-T T.81 baseline sequential AND progressive DCT
processes from the public spec: 8×8 block DCT, Annex-K quantization
tables (libjpeg's quality scaling curve), Annex-K Huffman tables, JFIF
container.  This retires the last stubbed image format in
:mod:`multimodal` — the engine now decodes BMP, netpbm, PNG and JPEG
(sequential and progressive) genuinely.

Scope and honesty notes:

* **Encoder** (:func:`encode_jpeg`): grayscale or RGB, 4:4:4 (no chroma
  subsampling), no restart intervals.  ``progressive=True`` emits an
  SOF2 stream with a libjpeg-style scan script (DC first + refinement,
  spectrally-split luma AC, per-component chroma AC, AC refinement —
  successive approximation Al=1→0 throughout); AC scans use a flat
  8-bit custom Huffman table whose alphabet covers the EOBn run
  symbols Annex K lacks.  Fully deterministic — identical input bytes
  in, identical JPEG bytes out (the property the dedup pipelines rely
  on).  The DCT / quantization path is vectorized over all blocks at
  once (one einsum); only the entropy coder walks blocks in Python.
* **Decoder** (:func:`decode_jpeg`): baseline sequential (SOF0/1) and
  progressive (SOF2, spectral selection + successive approximation,
  T.81 Annex G decoding incl. EOB runs) — arbitrary sampling factors
  (4:2:0/4:2:2/4:4:4), multi-scan streams, multiple DQT/DHT segments,
  DRI/RSTn restart markers.  Arithmetic coding, 12-bit precision, and
  streams that leave a component without any DC scan raise
  ``ValueError`` LOUDLY — a partial decode would silently drop chroma.
  Entropy decoding is a per-coefficient Python loop — JPEG Huffman is
  inherently sequential — so at scale this runs where every per-image
  kernel runs: inside an actor-pool ``map_batches`` stage, one image
  per call, parallel across the pool.

JPEG is lossy: round-trips are verified by PSNR bound, not byte
equality (the encoder's own bytes ARE byte-stable).
"""

from __future__ import annotations

import numpy as np

# --- Annex K tables ----------------------------------------------------------

_QUANT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

_QUANT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Huffman table specs: (BITS[1..16], HUFFVAL) — T.81 Annex K.3
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))

_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zigzag: _ZIGZAG[k] = row-major index of the k-th coefficient in scan order
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Orthonormal DCT-II basis: C[k, n] = a(k) cos((2n+1) k pi / 16)
_DCT_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
    _DCT_C[_k] = _a * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)
del _k, _a


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality→table scaling (jcparam.c, public source)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length); canonical codes in BITS order (T.81 C.2)."""
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


def _build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-at-a-time decoder."""
    out: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _build_huffman_codes(bits, vals).items():
        out[(length, code)] = sym
    return out


# --- bit IO ------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (T.81 F.1.2.3)


class _BitReader:
    """Reads the entropy-coded segment: unstuffs 0xFF00, stops at any
    other marker (leaving the cursor ON the 0xFF)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("jpeg: truncated stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt & 0x07)
            else:
                raise ValueError("jpeg: entropy data ran into a marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def skip_restart(self) -> None:
        """Consume the RSTn marker the reader is positioned on.  The
        interval's final pad byte may itself be a stuffed 0xFF (FF 00)
        or fill 0xFF bytes may precede the marker (T.81 B.1.1.2) —
        step over both before requiring RSTn."""
        self.byte_align()
        d = self.data
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0x00:
            self.pos += 2  # stuffed pad byte from the closing flush
        while (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and d[self.pos + 1] == 0xFF
        ):
            self.pos += 1  # fill bytes before the marker
        if (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("jpeg: expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, n: int) -> None:
        self.n = n


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# --- encoder -----------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane → (n_blocks, 8, 8), edge-padded to 8 multiples,
    blocks in raster order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return (
        plane.reshape(H // 8, 8, W // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _quantized_zigzag(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """All of a component's blocks → (n, 64) int32 quantized zigzag rows
    — the vectorized half of the encoder (one einsum DCT for every
    block at once)."""
    blocks = _blocks_of(plane) - 128.0
    coef = np.einsum("ij,njk,lk->nil", _DCT_C, blocks, _DCT_C)
    q = np.rint(coef / qtab).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZIGZAG]


def _encode_block(
    zz: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    w: _BitWriter,
) -> int:
    dc = int(zz[0])
    s, bits = _magnitude(dc - prev_dc)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(bits, s)
    nz = np.flatnonzero(zz[1:])
    pos = 0
    for idx in nz:
        run = int(idx) - pos
        while run >= 16:
            zrl, zl = ac_codes[0xF0]
            w.write(zrl, zl)
            run -= 16
        s, bits = _magnitude(int(zz[1 + idx]))
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(bits, s)
        pos = int(idx) + 1
    if pos < 63:
        eob, el = ac_codes[0x00]
        w.write(eob, el)
    return dc


# Progressive AC scans need EOBn run symbols (0x10..0xE0) that the
# Annex-K AC alphabets lack; a flat canonical table (every symbol 8
# bits: 176 × 2⁻⁸ < 1 Kraft) trades compression for a full alphabet —
# run 0..15 × size 0..10 covers EOB/EOBn, ZRL and every magnitude the
# quality-scaled quantizers can produce.
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward ZERO
    (T.81 G.1.1.1 — DC uses an arithmetic shift instead)."""
    return -((-v) >> al) if v < 0 else v >> al


def encode_jpeg(img: np.ndarray, *, quality: int = 90, progressive: bool = False) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → JFIF bytes.

    4:4:4 (no subsampling), deterministic output.  ``progressive=True``
    emits an SOF2 stream with a libjpeg-style scan script — interleaved
    DC first scan at Al=1 + DC refinement, spectrally-split luma AC
    (1-5, 6-63) and whole-range chroma AC at Al=1, then per-component
    AC refinement to Al=0 — exercising spectral selection, successive
    approximation and EOB-run coding end to end.  Raises ``ValueError``
    on non-uint8 / wrong-shape input.
    """
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects uint8 (h,w) or (h,w,3)")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError("encode_jpeg expects 3 channels for color")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    gray = img.ndim == 2
    qlum = _scaled_quant(_QUANT_LUM, quality)
    qchrom = _scaled_quant(_QUANT_CHROM, quality)

    if gray:
        planes = [img.astype(np.float64)]
        qtabs = [qlum]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qtabs = [qlum, qchrom, qchrom]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def seg(marker: int, payload: bytes) -> None:
        out.extend((0xFF, marker))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    seg(0xDB, bytes([0]) + bytes(qlum.reshape(64)[_ZIGZAG].astype(np.uint8)))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(qchrom.reshape(64)[_ZIGZAG].astype(np.uint8)))

    ncomp = 1 if gray else 3
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    seg(0xC2 if progressive else 0xC0, bytes(sof))

    zz_per_comp = [_quantized_zigzag(p, q) for p, q in zip(planes, qtabs)]
    n_blocks = zz_per_comp[0].shape[0]

    if progressive:
        _encode_progressive_scans(out, seg, zz_per_comp, gray)
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    for tc, th, bits, vals in (
        (0, 0, _DC_LUM_BITS, _DC_LUM_VALS),
        (1, 0, _AC_LUM_BITS, _AC_LUM_VALS),
    ) + (() if gray else (
        (0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS),
        (1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS),
    )):
        seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    sos = bytearray([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    dc_lum = _build_huffman_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _build_huffman_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chrom = _build_huffman_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_chrom = _build_huffman_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)

    writer = _BitWriter()
    prev = [0] * ncomp
    # 4:4:4 ⇒ one block per component per MCU, raster order
    for bi in range(n_blocks):
        for ci in range(ncomp):
            dc_c = dc_lum if ci == 0 else dc_chrom
            ac_c = ac_lum if ci == 0 else ac_chrom
            prev[ci] = _encode_block(
                zz_per_comp[ci][bi], prev[ci], dc_c, ac_c, writer
            )
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_progressive_scans(out: bytearray, seg, zz_per_comp, gray: bool) -> None:
    """Emit the progressive scan script over precomputed quantized
    zigzag blocks (T.81 Annex G encoding): successive approximation
    Al=1 → 0 for both DC and AC, luma AC spectrally split."""
    ncomp = len(zz_per_comp)
    n_blocks = zz_per_comp[0].shape[0]

    for tc, th, bits, vals in (
        (0, 0, _DC_LUM_BITS, _DC_LUM_VALS),
        (1, 0, _PROG_AC_BITS, _PROG_AC_VALS),
    ) + (() if gray else ((0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS),)):
        seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    dc_codes = [
        _build_huffman_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ] + [_build_huffman_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)] * (ncomp - 1)
    ac_codes = _build_huffman_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> None:
        body = bytearray([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, ((0 if cid == 1 else 1) << 4) | 0])
        body += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(body))

    # --- scan 1: DC first, interleaved, Al=1 ---
    sos(list(range(1, ncomp + 1)), 0, 0, 0, 1)
    w = _BitWriter()
    prev = [0] * ncomp
    for bi in range(n_blocks):
        for ci in range(ncomp):
            v = int(zz_per_comp[ci][bi][0]) >> 1  # DC point transform: >>Al
            s, bits = _magnitude(v - prev[ci])
            code, length = dc_codes[ci][s]
            w.write(code, length)
            if s:
                w.write(bits, s)
            prev[ci] = v
    w.flush()
    out += w.buf

    # --- AC first scans at Al=1: luma split 1-5 / 6-63, chroma 1-63 ---
    bands = [(0, 1, 5), (0, 6, 63)] + [(ci, 1, 63) for ci in range(1, ncomp)]
    for ci, ss, se in bands:
        sos([ci + 1], ss, se, 0, 1)
        w = _BitWriter()
        _write_ac_first(w, ac_codes, zz_per_comp[ci], ss, se, 1)
        w.flush()
        out += w.buf

    # --- DC refinement: Ah=1 → Al=0, interleaved, raw bits ---
    sos(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    w = _BitWriter()
    for bi in range(n_blocks):
        for ci in range(ncomp):
            w.write(int(zz_per_comp[ci][bi][0]) & 1, 1)
    w.flush()
    out += w.buf

    # --- AC refinement scans: Ah=1 → Al=0, whole AC range per comp ---
    for ci in range(ncomp):
        sos([ci + 1], 1, 63, 1, 0)
        w = _BitWriter()
        _write_ac_refine(w, ac_codes, zz_per_comp[ci], 1, 63, 0)
        w.flush()
        out += w.buf


def _write_ac_first(w: _BitWriter, ac_codes, blocks: np.ndarray,
                    ss: int, se: int, al: int) -> None:
    """AC first scan (T.81 G.1.2.2): run/size symbols over the point-
    transformed band, zero blocks folded into EOB runs."""
    eobrun = 0

    def emit_eobrun() -> None:
        nonlocal eobrun
        if not eobrun:
            return
        nbits = eobrun.bit_length() - 1
        code, length = ac_codes[nbits << 4]
        w.write(code, length)
        if nbits:
            w.write(eobrun - (1 << nbits), nbits)
        eobrun = 0

    for zz in blocks:
        band = [_pt_ac(int(v), al) for v in zz[ss : se + 1]]
        nz = [i for i, v in enumerate(band) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
            continue
        emit_eobrun()
        pos = 0
        for idx in nz:
            run = idx - pos
            while run >= 16:
                code, length = ac_codes[0xF0]
                w.write(code, length)
                run -= 16
            s, bits = _magnitude(band[idx])
            if s > 10:
                raise ValueError("jpeg: AC magnitude exceeds progressive alphabet")
            code, length = ac_codes[(run << 4) | s]
            w.write(code, length)
            w.write(bits, s)
            pos = idx + 1
        if pos <= se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def _write_ac_refine(w: _BitWriter, ac_codes, blocks: np.ndarray,
                     ss: int, se: int, al: int) -> None:
    """AC refinement scan (T.81 G.1.2.3), emitted as an exact mirror of
    the decoder's coefficient walk: newly-visible coefficients (|t|=1)
    as run/1 symbols counting only zero-HISTORY gaps, correction bits
    for already-nonzero history interleaved exactly where the decoder's
    walk passes them, EOB runs carrying the tail bits."""
    eobrun = 0
    pending: list[int] = []

    def emit_eobrun() -> None:
        nonlocal eobrun, pending
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, length = ac_codes[nbits << 4]
            w.write(code, length)
            if nbits:
                w.write(eobrun - (1 << nbits), nbits)
        for b in pending:
            w.write(b, 1)
        pending = []
        eobrun = 0

    for zz in blocks:
        band = [_pt_ac(int(v), al) for v in zz[ss : se + 1]]
        new_positions = [i for i, v in enumerate(band) if abs(v) == 1]
        if not new_positions:
            # no newly-visible coefficient: whole block joins the EOB
            # run; its history correction bits queue behind the EOBn
            eobrun += 1
            pending.extend(abs(v) & 1 for v in band if abs(v) > 1)
            if eobrun == 0x7FFF:
                emit_eobrun()
            continue
        emit_eobrun()
        i = 0  # the decoder's walk cursor
        for npos in new_positions:
            # zero-history gap between cursor and the new coefficient
            gap = sum(1 for j in range(i, npos) if band[j] == 0)
            while gap > 15:
                # ZRL consumes 16 zeros; the decoder reads a correction
                # bit at every nonzero it passes along the way, so the
                # bits interleave positionally (flushing them all after
                # the ZRL would desync around history beyond the 16th
                # zero)
                code, length = ac_codes[0xF0]
                w.write(code, length)
                zeros = 0
                while zeros < 16:
                    if band[i] == 0:
                        zeros += 1
                    else:
                        w.write(abs(band[i]) & 1, 1)
                    i += 1
                gap -= 16
            code, length = ac_codes[(gap << 4) | 1]
            w.write(code, length)
            w.write(1 if band[npos] > 0 else 0, 1)
            # walk to the placement position: correction bits for the
            # nonzero history passed (zeros are covered by the run)
            for j in range(i, npos):
                if band[j] != 0:
                    w.write(abs(band[j]) & 1, 1)
            i = npos + 1
        if i <= len(band) - 1:
            # tail after the last new coefficient: the decoder is still
            # mid-walk and needs an EOB to close the block
            eobrun += 1
            pending.extend(abs(v) & 1 for v in band[i:] if abs(v) > 1)
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


# --- decoder -----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF/JPEG bytes → uint8 (h, w) or (h, w, 3).

    Baseline sequential (SOF0/1) and progressive (SOF2) processes:
    multi-scan streams, spectral selection, successive approximation
    (T.81 Annex G: DC/AC first + refinement scans, EOB runs), arbitrary
    sampling factors (chroma upsampled by sample repetition), multiple
    DQT/DHT segments, DRI/RSTn restarts.  Arithmetic / 12-bit inputs,
    and streams that never give some component a DC scan, raise
    ``ValueError``.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    height = width = 0
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    restart_interval = 0
    progressive = False
    saw_scan = False
    pos = 2
    n = len(payload)

    def alloc_grids() -> None:
        nonlocal hmax, vmax, mcus_x, mcus_y
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcus_x = -(-width // (8 * hmax))
        mcus_y = -(-height // (8 * vmax))
        for c in comps:
            c["bw"] = mcus_x * c["h"]  # MCU-padded block grid
            c["bh"] = mcus_y * c["v"]
            # non-interleaved (single-component scan) block grid
            c["cw"] = -(-(-(-width * c["h"]) // hmax) // 8)
            c["ch"] = -(-(-(-height * c["v"]) // vmax) // 8)
            c["zz"] = np.zeros((c["bh"], c["bw"], 64), dtype=np.int32)
            c["has_dc"] = False

    def decode_scan(scomps: list[dict], ss: int, se: int, ah: int, al: int,
                    start: int) -> int:
        """Decode one scan\'s entropy data; returns the stream position of
        the next marker.  Implements T.81 F.2 (sequential) and G.2
        (progressive: first + refinement scans, EOB runs)."""
        reader = _BitReader(payload, start)
        eobrun = 0
        for c in scomps:
            c["pred"] = 0

        def huff_decode(table: dict) -> int:
            code = length = 0
            while True:
                code = (code << 1) | reader.read_bit()
                length += 1
                if length > 16:
                    raise ValueError("jpeg: bad Huffman stream")
                sym = table.get((length, code))
                if sym is not None:
                    return sym

        def decode_unit_first(c: dict, zz: np.ndarray) -> None:
            """DC+AC first pass over [ss..se] — baseline is the ss=0,
            se=63, al=0 special case."""
            nonlocal eobrun
            k = ss
            if k == 0:
                sym = huff_decode(c["dc"])
                diff = _extend(reader.read_bits(sym), sym) if sym else 0
                c["pred"] += diff
                zz[0] = c["pred"] << al
                k = 1
            if k > se:
                return
            if eobrun:
                eobrun -= 1
                return
            while k <= se:
                sym = huff_decode(c["ac"])
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run != 15:
                        eobrun = (1 << run) - 1
                        if run:
                            eobrun += reader.read_bits(run)
                        return
                    k += 16
                    continue
                k += run
                if k > se:
                    raise ValueError("jpeg: AC index out of range")
                zz[k] = _extend(reader.read_bits(size), size) << al
                k += 1

        def refine_nonzero(zz: np.ndarray, k: int, stop: int, p1: int) -> None:
            """Correction bits for already-nonzero coefficients in
            [k..stop] (the EOB-run branch of G.1.2.3)."""
            while k <= stop:
                if zz[k] != 0 and reader.read_bit():
                    if (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else -p1
                k += 1

        def decode_unit_refine(c: dict, zz: np.ndarray) -> None:
            """Refinement pass (ah > 0): DC appends one bit; AC walks
            the zigzag interleaving newly-nonzero placements with
            correction bits for old coefficients."""
            nonlocal eobrun
            p1 = 1 << al
            if ss == 0:
                if reader.read_bit():
                    zz[0] |= p1
                return
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = huff_decode(c["ac"])
                    run, size = sym >> 4, sym & 0x0F
                    val = 0
                    if size == 0:
                        if run != 15:
                            eobrun = 1 << run
                            if run:
                                eobrun += reader.read_bits(run)
                            break
                        # ZRL: pass 16 zero-history coefficients
                    elif size == 1:
                        val = p1 if reader.read_bit() else -p1
                    else:
                        raise ValueError("jpeg: bad AC refinement symbol")
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and (zz[k] & p1) == 0:
                                zz[k] += p1 if zz[k] >= 0 else -p1
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if val:
                        if k > se:
                            raise ValueError("jpeg: AC refinement overrun")
                        zz[k] = val
                    k += 1
            if eobrun > 0:
                refine_nonzero(zz, k, se, p1)
                eobrun -= 1

        decode_unit = decode_unit_refine if ah else decode_unit_first

        interleaved = len(scomps) > 1
        unit_count = 0

        def maybe_restart() -> None:
            nonlocal eobrun
            if restart_interval and unit_count and unit_count % restart_interval == 0:
                reader.skip_restart()
                for c in scomps:
                    c["pred"] = 0
                eobrun = 0

        try:
            if interleaved:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        maybe_restart()
                        for c in scomps:
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    decode_unit(
                                        c,
                                        c["zz"][my * c["v"] + by, mx * c["h"] + bx],
                                    )
                        unit_count += 1
            else:
                c = scomps[0]
                for by in range(c["ch"]):
                    for bx in range(c["cw"]):
                        maybe_restart()
                        decode_unit(c, c["zz"][by, bx])
                        unit_count += 1
        except _RestartMarker:
            raise ValueError("jpeg: unexpected restart marker")

        # resync: byte-align, then step over fill bytes / stray RSTn to
        # the next real marker
        reader.byte_align()
        p = reader.pos
        while p + 1 < n:
            if payload[p] == 0xFF and payload[p + 1] not in (0x00, 0xFF):
                if 0xD0 <= payload[p + 1] <= 0xD7:
                    p += 2
                    continue
                return p
            p += 1
        raise ValueError("jpeg: truncated stream")

    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        if pos + 1 >= n:
            raise ValueError("jpeg: truncated stream")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            raise ValueError("jpeg: truncated stream")
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                if i + 65 > len(body):
                    raise ValueError("jpeg: truncated stream")
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                tab = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                full = np.zeros(64, dtype=np.int32)
                full[_ZIGZAG] = tab
                qtabs[tq] = full.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("jpeg: truncated stream")
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                if i + 17 + nv > len(body):
                    raise ValueError("jpeg: truncated stream")
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _build_huffman_decoder(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if len(body) < 6 or len(body) < 6 + 3 * body[5]:
                raise ValueError("jpeg: truncated stream")
            if body[0] != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            progressive = marker == 0xC2
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            if height and width:
                alloc_grids()
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline sequential and progressive supported"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("jpeg: truncated stream")
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if not comps or height == 0 or width == 0:
                raise ValueError("jpeg: SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("jpeg: truncated stream")
            ns = body[0]
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0  # baseline ignores spectral bytes
            else:
                if (ss == 0) != (se == 0) or se > 63 or se < ss:
                    raise ValueError("jpeg: bad progressive spectral range")
                if ss > 0 and ns != 1:
                    raise ValueError("jpeg: progressive AC scan must be single-component")
            scomps = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si : 3 + 2 * si]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError("jpeg: scan names unknown component")
                needs_dc = ss == 0 and ah == 0
                needs_ac = se > 0
                if needs_dc:
                    if (0, tt >> 4) not in huff:
                        raise ValueError("jpeg: missing DC Huffman table")
                    comp["dc"] = huff[(0, tt >> 4)]
                    comp["has_dc"] = True
                if needs_ac:
                    if (1, tt & 0x0F) not in huff:
                        raise ValueError("jpeg: missing AC Huffman table")
                    comp["ac"] = huff[(1, tt & 0x0F)]
                scomps.append(comp)
            pos = decode_scan(scomps, ss, se, ah, al, pos + seglen)
            saw_scan = True
            continue
        pos += seglen

    if not saw_scan or height == 0 or width == 0:
        raise ValueError("jpeg: incomplete headers")
    missing = [c["id"] for c in comps if not c["has_dc"]]
    if missing:
        # legal per T.81 to scan components separately, but a stream that
        # ENDS with undecoded components must fail loudly, not silently
        # return partial pixels
        raise ValueError(
            f"jpeg: multi-scan stream left components {missing} undecoded"
        )

    planes = []
    for c in comps:
        if c["tq"] not in qtabs:
            raise ValueError("jpeg: missing quantization table")
        # vectorized dequantize + inverse DCT over every block at once
        full = np.zeros((c["bh"], c["bw"], 64), dtype=np.float64)
        full[:, :, _ZIGZAG] = c["zz"]
        blk = full.reshape(c["bh"], c["bw"], 8, 8) * qtabs[c["tq"]]
        pix = np.einsum("ji,xyjk,kl->xyil", _DCT_C, blk, _DCT_C) + 128.0
        p = pix.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:height, :width])

    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
