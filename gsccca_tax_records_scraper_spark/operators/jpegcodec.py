"""Baseline-sequential JPEG codec (ITU-T T.81), dependency-free numpy.

The container has no PIL/libjpeg/ffmpeg, so entropy-coded image support is
implemented here the same way `mediacodec` implements PNG: from the public
spec. This closes the largest remaining honest-NotImplementedError in the
multimodal path (the reference scraper handles document imagery end-to-end;
JPEG is the dominant web image format a crawl actually encounters).

Scope — explicitly gated, not silently wrong:
  encode: baseline 8-bit sequential (SOF0), grayscale or YCbCr at 4:4:4
          (default) or 4:2:0 (subsample=True), standard Annex K
          quantization tables scaled by the libjpeg quality formula,
          standard Annex K huffman tables, no restart markers.
  decode: baseline 8-bit sequential interleaved AND progressive (SOF2,
          full spectral selection + successive approximation with shared
          EOB runs — _prog_scan), grayscale or YCbCr with any sampling
          factors in {1, 2} — covers 4:4:4, 4:2:2 and 4:2:0, i.e. what
          the web actually serves. Arithmetic coding (SOF9+), lossless/
          hierarchical frames, 12-bit, sampling factors > 2 and
          non-interleaved BASELINE multi-scan files raise
          UnsupportedMediaError — the caller's decoded=False path, the
          same honest gate the other codecs use.

The DCT/IDCT and color transforms are vectorized over every 8x8 block at
once (one einsum per image); only the entropy coding walks coefficients in
Python, which is fine at the thumbnail/fixture scale the tests and the
mapInPandas feature batches use.

Spark-side plumbing (schema, batching, dispatch) lives in
operators/multimodal.py; this module is pure bytes -> numpy.
"""

from __future__ import annotations

import struct

import numpy as np

from .mediacodec import UnsupportedMediaError

# ------------------------------------------------------------- constants
# zigzag scan order: index i of the scan -> (row, col) flattened offset
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K (K.1/K.2) base quantization tables, natural (row-major) order
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K huffman specs: (BITS[1..16], HUFFVAL) per table
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: forward = C @ B @ C.T, inverse = C.T @ B @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 -> base tables, 100 -> all ones."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255)


# -------------------------------------------------------- huffman tables
def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical huffman assignment (T.81 C.2): val -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_BITS = 9  # covers every code the Annex K tables assign below len 10


class _HuffDecoder:
    """Canonical huffman decode state (T.81 F.2.2.3) with a 9-bit prefix
    LUT fast path: one peek resolves any code of length <= 9 (the common
    case by construction — short codes are the frequent symbols); longer
    codes fall back to the per-length min/max walk. Measured: the win over
    the per-bit walk is modest (~160k symbols/s either way — per-symbol
    Python call overhead dominates, spread across peek/skip/receive), but
    the multi-bit reader it rides on also gives the progressive path its
    restart realignment (align()) and honest past-end semantics."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
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
            else:
                self.maxcode[length] = -1
            code <<= 1
        self.lut: list[tuple[int, int] | None] = [None] * (1 << _LUT_BITS)
        for sym, (c, length) in _build_codes(bits, vals).items():
            if length <= _LUT_BITS:
                base = c << (_LUT_BITS - length)
                for i in range(1 << (_LUT_BITS - length)):
                    self.lut[base + i] = (length, sym)

    def decode(self, br: "_BitReader") -> int:
        ent = self.lut[br.peek(_LUT_BITS)]
        if ent is not None:
            br.skip(ent[0])
            return ent[1]
        for length in range(_LUT_BITS + 1, 17):
            if self.maxcode[length] >= 0:
                code = br.peek(length)
                if code <= self.maxcode[length]:
                    br.skip(length)
                    return self.vals[
                        self.valptr[length] + code - self.mincode[length]
                    ]
        raise UnsupportedMediaError("JPEG: corrupt huffman stream")


class _BitReader:
    """MSB-first reader over the entropy-coded bytes (stuffing removed).
    Peeks past the end return 1-padding (T.81 pad bits), but CONSUMING
    past the real bit count raises — a valid stream never does."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.consumed = 0
        self.limit = 8 * len(data)

    def _fill(self, n: int) -> None:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def peek(self, n: int) -> int:
        self._fill(n)
        return (self.acc >> (self.nbits - n)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self._fill(n)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        self.consumed += n
        if self.consumed > self.limit:
            raise UnsupportedMediaError("JPEG: entropy stream truncated")

    def read_bit(self) -> int:
        v = self.peek(1)
        self.skip(1)
        return v

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek(n)
        self.skip(n)
        return v

    def align(self) -> None:
        """Discard pad bits to the next byte boundary (restart resync)."""
        rem = self.consumed % 8
        if rem:
            self.skip(8 - rem)


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1: map a `size`-bit magnitude to its signed value."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


# --------------------------------------------------------------- encoder
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
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # shed emitted high bits — an unmasked accumulator grows into a
        # stream-length bignum and turns every shift O(stream)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:  # pad with 1-bits (T.81 F.1.2.3)
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(n, 8, 8) float blocks -> DCT coefficients, one einsum."""
    return np.einsum("ij,njk,lk->nil", _C, plane, _C, optimize=True)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _C, coef, _C, optimize=True)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (n, 8, 8), raster MCU order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8 // 8, w8 // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h8, w8)
    )


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _encode_plane(
    wr: _BitWriter,
    coef_zz: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    dc_pred: int,
) -> int:
    """Huffman-encode one component's zigzagged quantized blocks (n, 64)."""
    for blk in coef_zz:
        diff = int(blk[0]) - dc_pred
        dc_pred = int(blk[0])
        size = _size_cat(diff)
        code, length = dc_codes[size]
        wr.write(code, length)
        if size:
            wr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        nz = np.flatnonzero(blk[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                wr.write(code, length)
                run -= 16
            size = _size_cat(v)
            code, length = ac_codes[(run << 4) | size]
            wr.write(code, length)
            wr.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last < 63:
            code, length = ac_codes[0x00]  # EOB
            wr.write(code, length)
    return dc_pred


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> baseline JFIF bytes.
    `subsample=True` emits 4:2:0 (2x2-mean chroma, the common web shape);
    default is 4:4:4."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    if ch not in (1, 3):
        raise UnsupportedMediaError(f"JPEG encode: {ch}-channel input")
    qlum = _quality_scale(_Q_LUM, quality)
    qchrom = _quality_scale(_Q_CHROM, quality)
    samp = (
        [(1, 1)]
        if ch == 1
        else ([(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3)
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # edge-replicate pad to the MCU grid (8*hmax x 8*vmax pixel tiles)
    hp = -(-h // (8 * vmax)) * 8 * vmax
    wp = -(-w // (8 * hmax)) * 8 * hmax
    padded = np.pad(
        pixels.astype(np.float64), ((0, hp - h), (0, wp - w), (0, 0)), mode="edge"
    )
    full = (
        [padded[..., 0]] if ch == 1 else list(np.moveaxis(_rgb_to_ycbcr(padded), -1, 0))
    )
    qtabs = [qlum] + [qchrom] * (len(full) - 1)
    zz_all = []
    for c, ((hi, vi), q) in enumerate(zip(samp, qtabs)):
        plane = full[c]
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:  # 2x2-mean chroma downsample
            plane = plane.reshape(hp // ry, ry, wp // rx, rx).mean(axis=(1, 3))
        coef = _fdct_blocks(_to_blocks(plane - 128.0))
        quant = np.round(coef.reshape(-1, 64) / q.reshape(1, 64)).astype(np.int64)
        zz_all.append(quant[:, _ZIGZAG])

    dc_lum = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chrom = _build_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_chrom = _build_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)
    wr = _BitWriter()
    preds = [0] * len(full)
    # interleaved MCU order (T.81 A.2.3): hi*vi raster blocks per
    # component per MCU — mirrors the decoder's layout exactly
    mcux, mcuy = wp // (8 * hmax), hp // (8 * vmax)
    wbs = [mcux * hi for hi, _ in samp]
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for c, (hi, vi) in enumerate(samp):
            for by in range(vi):
                for bx in range(hi):
                    b = (my * vi + by) * wbs[c] + mx * hi + bx
                    preds[c] = _encode_plane(
                        wr,
                        zz_all[c][b : b + 1],
                        dc_lum if c == 0 else dc_chrom,
                        ac_lum if c == 0 else ac_chrom,
                        preds[c],
                    )
    entropy = wr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qlum[_ZIGZAG].astype(np.uint8)))
    if len(full) > 1:
        out += seg(0xDB, b"\x01" + bytes(qchrom[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(full))
    for c, (hi, vi) in enumerate(samp):
        sof += struct.pack(">BBB", c + 1, (hi << 4) | vi, 0 if c == 0 else 1)
    out += seg(0xC0, sof)
    for tclass, tid, bits, vals in (
        (0, 0, _DC_LUM_BITS, _DC_LUM_VALS),
        (1, 0, _AC_LUM_BITS, _AC_LUM_VALS),
        (0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS),
        (1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS),
    )[: 2 if len(full) == 1 else 4]:
        out += seg(
            0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    sos = bytes([len(full)])
    for c in range(len(full)):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder
def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, ch) uint8 (ch = 1 gray, 3 RGB)."""
    if blob[:2] != b"\xff\xd8":
        raise UnsupportedMediaError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    coef = None  # progressive: per-component coefficient accumulators
    restart_interval = 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise UnsupportedMediaError("JPEG: bad marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM / RSTn: bare
            continue
        (seg_len,) = struct.unpack(">H", blob[pos : pos + 2])
        payload = blob[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise UnsupportedMediaError("JPEG: 16-bit quant tables")
                tab = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qtabs[tq] = tab.astype(np.int64)[_UNZIGZAG]
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tclass, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(tclass, tid)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise UnsupportedMediaError(f"JPEG: {prec}-bit precision")
            comps = []
            for c in range(nc):
                cid, sampling, tq = payload[6 + 3 * c : 9 + 3 * c]
                hi, vi = sampling >> 4, sampling & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise UnsupportedMediaError(
                        f"JPEG: sampling factor {hi}x{vi} unsupported"
                    )
                comps.append({"id": cid, "tq": tq, "hi": hi, "vi": vi})
            frame = {"h": fh, "w": fw, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, *range(0xC5, 0xC8), *range(0xC9, 0xCC)):
            raise UnsupportedMediaError(
                f"JPEG: unsupported frame type (marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise UnsupportedMediaError("JPEG: SOS before SOF")
            ns = payload[0]
            sel = []
            for c in range(ns):
                cs, tt = payload[1 + 2 * c : 3 + 2 * c]
                idx = next(
                    (i for i, cm in enumerate(frame["comps"]) if cm["id"] == cs),
                    None,
                )
                if idx is None:
                    raise UnsupportedMediaError("JPEG: scan names unknown component")
                sel.append((idx, tt >> 4, tt & 0xF))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            if not frame.get("progressive"):
                if ns != len(frame["comps"]):
                    raise UnsupportedMediaError(
                        "JPEG: non-interleaved scan (one scan per component)"
                    )
                return _decode_scan(
                    blob, pos, frame, [(d, a) for _, d, a in sel], qtabs, huff,
                    restart_interval,
                )
            # progressive: accumulate this scan's coefficient contributions
            if coef is None:
                coef = _alloc_coef(frame)
            data, pos = _destuff(blob, pos)
            _prog_scan(
                data, frame, coef, sel, ss, se, ahal >> 4, ahal & 0xF, huff,
                restart_interval,
            )
        # APPn/COM and anything else: skipped
    if frame is not None and frame.get("progressive") and coef is not None:
        return _reconstruct(frame, coef, qtabs)
    raise UnsupportedMediaError("JPEG: no scan data")


def _destuff(blob: bytes, pos: int) -> tuple[bytes, int]:
    """Entropy bytes from `pos` to the next real marker, 0xFF00 unstuffed
    and restart markers dropped (readers resync at computed boundaries).
    Returns (data, position of the next marker's 0xFF)."""
    data = bytearray()
    p = pos
    while p < len(blob) - 1:
        b = blob[p]
        if b == 0xFF:
            nxt = blob[p + 1]
            if nxt == 0x00:
                data.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                p += 2
                continue
            break
        data.append(b)
        p += 1
    return bytes(data), p


def _geometry(frame: dict) -> tuple[int, int, int, int, list[int], list[int]]:
    """Interleaved MCU layout (T.81 A.2.3): an MCU covers an
    (8*hmax) x (8*vmax) pixel tile and carries hi*vi blocks per component
    in raster order — hmax=vmax=1 degenerates to one block per component.
    Returns (hmax, vmax, mcux, mcuy, wb, hb) with wb/hb the per-component
    MCU-padded block-grid dims."""
    comps = frame["comps"]
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    wb = [mcux * c["hi"] for c in comps]
    hb = [mcuy * c["vi"] for c in comps]
    return hmax, vmax, mcux, mcuy, wb, hb


def _alloc_coef(frame: dict) -> list[np.ndarray]:
    _, _, _, _, wb, hb = _geometry(frame)
    return [
        np.zeros((hb[c] * wb[c], 64), dtype=np.int64)
        for c in range(len(frame["comps"]))
    ]


def _decode_scan(
    blob: bytes,
    pos: int,
    frame: dict,
    tables: list[tuple[int, int]],
    qtabs: dict[int, np.ndarray],
    huff: dict[tuple[int, int], _HuffDecoder],
    restart_interval: int,
) -> np.ndarray:
    data, _ = _destuff(blob, pos)
    comps = frame["comps"]
    nc = len(comps)
    hmax, vmax, mcux, mcuy, wb, hb = _geometry(frame)
    coef = _alloc_coef(frame)
    br = _BitReader(data)
    preds = [0] * nc
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            preds = [0] * nc
            br.align()  # byte-align at restart boundaries
        my, mx = divmod(m, mcux)
        for c in range(nc):
            dc_dec = huff.get((0, tables[c][0]))
            ac_dec = huff.get((1, tables[c][1]))
            if dc_dec is None or ac_dec is None:
                raise UnsupportedMediaError("JPEG: missing huffman table")
            for by in range(comps[c]["vi"]):
                for bx in range(comps[c]["hi"]):
                    b = (my * comps[c]["vi"] + by) * wb[c] + mx * comps[c]["hi"] + bx
                    size = dc_dec.decode(br)
                    diff = _extend(br.receive(size), size)
                    preds[c] += diff
                    coef[c][b, 0] = preds[c]
                    k = 1
                    while k < 64:
                        rs = ac_dec.decode(br)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise UnsupportedMediaError("JPEG: AC index overflow")
                        coef[c][b, k] = _extend(br.receive(size), size)
                        k += 1
    return _reconstruct(frame, coef, qtabs)


def _reconstruct(
    frame: dict, coef: list[np.ndarray], qtabs: dict[int, np.ndarray]
) -> np.ndarray:
    """Dequantize + IDCT + upsample + crop the accumulated coefficient
    grids — shared by the sequential single-scan path and the progressive
    end-of-image path."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    nc = len(comps)
    hmax, vmax, _, _, wb, hb = _geometry(frame)
    planes = []
    for c in range(nc):
        q = qtabs.get(comps[c]["tq"])
        if q is None:
            raise UnsupportedMediaError("JPEG: missing quant table")
        deq = (coef[c][:, _UNZIGZAG] * q.reshape(1, 64)).reshape(-1, 8, 8)
        plane = _idct_blocks(deq.astype(np.float64)) + 128.0
        plane = _from_blocks(plane, hb[c] * 8, wb[c] * 8)
        # upsample subsampled components to full resolution (nearest),
        # then crop the MCU padding
        ry, rx = vmax // comps[c]["vi"], hmax // comps[c]["hi"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    if nc == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    raise UnsupportedMediaError(f"JPEG: {nc}-component scan")

# ---------------------------------------------------- progressive scans
def _prog_scan(
    data: bytes,
    frame: dict,
    coef: list[np.ndarray],
    sel: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff: dict[tuple[int, int], _HuffDecoder],
    restart_interval: int,
) -> None:
    """One progressive scan (T.81 G.2): spectral band [ss, se] of the
    selected components at successive-approximation stage (ah -> al).
    DC scans (ss == 0) may interleave all components in MCU order; AC
    scans are single-component in the component's own block-raster order.
    Control flow mirrors T.81 G.1.2 (the same structure libjpeg's
    jdphuff.c implements): first scans (ah == 0) Huffman-code magnitudes
    point-transformed by al; refinement scans (ah > 0) append one
    magnitude bit per already-nonzero coefficient and place newly-nonzero
    coefficients at +-(1 << al), with shared end-of-band (EOB) runs."""
    br = _BitReader(data)
    comps = frame["comps"]
    _, _, mcux, mcuy, wb, hb = _geometry(frame)
    if ss == 0:  # ---------------------------------------------- DC scan
        if se != 0:
            raise UnsupportedMediaError("JPEG: DC scan with se != 0")
        preds = [0] * len(sel)

        def dc_block(blk: np.ndarray, i: int, dc_dec) -> None:
            if ah == 0:
                size = dc_dec.decode(br)
                preds[i] += _extend(br.receive(size), size)
                blk[0] = preds[i] << al
            elif br.read_bit():
                blk[0] |= 1 << al  # two's-complement OR refines negatives too

        if len(sel) > 1:  # interleaved MCU traversal
            for m in range(mcux * mcuy):
                if restart_interval and m and m % restart_interval == 0:
                    preds = [0] * len(sel)
                    br.align()
                my, mx = divmod(m, mcux)
                for i, (ci, dc_t, _) in enumerate(sel):
                    dc_dec = huff.get((0, dc_t))
                    if ah == 0 and dc_dec is None:
                        raise UnsupportedMediaError("JPEG: missing huffman table")
                    hi, vi = comps[ci]["hi"], comps[ci]["vi"]
                    for by in range(vi):
                        for bx in range(hi):
                            b = (my * vi + by) * wb[ci] + mx * hi + bx
                            dc_block(coef[ci][b], i, dc_dec)
        else:
            ci, dc_t, _ = sel[0]
            dc_dec = huff.get((0, dc_t))
            if ah == 0 and dc_dec is None:
                raise UnsupportedMediaError("JPEG: missing huffman table")
            for n, b in enumerate(_scan_blocks(frame, ci)):
                if restart_interval and n and n % restart_interval == 0:
                    preds = [0] * len(sel)
                    br.align()
                dc_block(coef[ci][b], 0, dc_dec)
        return
    # -------------------------------------------------------- AC scan
    if len(sel) != 1:
        raise UnsupportedMediaError("JPEG: interleaved AC scan")
    ci, _, ac_t = sel[0]
    ac_dec = huff.get((1, ac_t))
    if ac_dec is None:
        raise UnsupportedMediaError("JPEG: missing huffman table")
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    for n, b in enumerate(_scan_blocks(frame, ci)):
        if restart_interval and n and n % restart_interval == 0:
            eobrun = 0
            br.align()
        blk = coef[ci][b]
        if ah == 0:  # ------------------------- first scan for this band
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = ac_dec.decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.receive(r)
                    break
                k += r
                if k > se:
                    raise UnsupportedMediaError("JPEG: AC index overflow")
                blk[k] = _extend(br.receive(s), s) << al
                k += 1
            continue
        # --------------------------- refinement scan (T.81 G.1.2.3)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = ac_dec.decode(br)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s:
                    if s != 1:
                        raise UnsupportedMediaError("JPEG: bad refinement size")
                    newval = p1 if br.read_bit() else m1
                elif r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # advance r zero-history positions, emitting correction
                # bits for every nonzero coefficient passed on the way
                while k <= se:
                    if blk[k] != 0:
                        if br.read_bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            # block inside an EOB run: remaining nonzero coefficients of
            # the band still receive correction bits
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            eobrun -= 1


def _scan_blocks(frame: dict, ci: int):
    """Block indices (into the MCU-padded coefficient grid) of component
    `ci` in NON-INTERLEAVED scan order: the component's own block raster,
    whose dims come from the component's true size (T.81 A.2.2) — the
    MCU-padded grid can be wider for subsampled layouts."""
    comps = frame["comps"]
    hmax, vmax, _, _, wb, hb = _geometry(frame)
    cw = (frame["w"] * comps[ci]["hi"] + hmax - 1) // hmax
    chh = (frame["h"] * comps[ci]["vi"] + vmax - 1) // vmax
    ws = (cw + 7) // 8
    hs = (chh + 7) // 8
    for row in range(hs):
        for col in range(ws):
            yield row * wb[ci] + col
