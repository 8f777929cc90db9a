"""Dependency-free media codecs: PPM/BMP images, PCM-WAV audio.

The container ships no image/audio libraries (no PIL/cv2/ffmpeg), but these
three formats are pure header + raw-array layouts that numpy decodes
directly, which makes the engine's media path REAL end-to-end for them:
sniff -> decode -> feature-extract -> resize -> re-encode, all vectorized
per blob. Compressed formats (PNG/JPEG/MP4/...) still require a codec
library and keep the honest NotImplementedError gate in
`operators/multimodal.py`.

Format layouts implemented from their public specs:
  PPM (P6)  "P6\\n<w> <h>\\n<maxval>\\n" + w*h*3 RGB bytes (netpbm spec)
  BMP       BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40), 24bpp,
            BI_RGB (uncompressed), 4-byte padded rows, bottom-up
  WAV       RIFF/WAVE with PCM 'fmt ' chunk + 'data' chunk, 16-bit samples
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedMediaError(ValueError):
    """Blob is not one of the codec-free formats this module decodes."""


def sniff(blob: bytes) -> str:
    if blob[:2] == b"P6":
        return "image/x-portable-pixmap"
    if blob[:2] == b"BM":
        return "image/bmp"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "audio/wav"
    return "application/octet-stream"


# ----------------------------------------------------------------- PPM (P6)

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM -> (h, w, 3) uint8."""
    if blob[:2] != b"P6":
        raise UnsupportedMediaError("not a P6 PPM")
    # header = three whitespace-separated tokens after the magic (w, h,
    # maxval), then ONE whitespace byte, then the raster
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(blob[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise UnsupportedMediaError(f"PPM maxval {maxval} != 255")
    raster = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


# ------------------------------------------------------------- BMP (24bpp)

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp BI_RGB BMP (bottom-up, BGR, padded rows)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(blob: bytes) -> np.ndarray:
    """24bpp uncompressed BMP -> (h, w, 3) uint8 RGB."""
    if blob[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    pixel_offset = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(f"BMP bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(blob, dtype=np.uint8, count=row_size * h, offset=pixel_offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


# ------------------------------------------------------------ WAV (16-bit)

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> PCM WAV."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (int16 samples [n, channels] squeezed to 1-D if mono,
    sample_rate). Walks RIFF chunks; only audio_format=1, 16-bit."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedMediaError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise UnsupportedMediaError(f"WAV format={audio_format} bits={bits}")
    samples = np.frombuffer(data, dtype=np.int16)
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, sample_rate


# ------------------------------------------------------------- transforms

def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index maps — the thumbnail path."""
    h, w = pixels.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[yi][:, xi]


def image_features(pixels: np.ndarray) -> dict:
    return {
        "width": int(pixels.shape[1]),
        "height": int(pixels.shape[0]),
        "channels": int(pixels.shape[2]),
        "mean_value": float(pixels.mean()),
    }


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    n = samples.shape[0]
    x = samples.astype(np.float64) / 32768.0
    return {
        "sample_rate": int(sample_rate),
        "duration_ms": int(round(n * 1000.0 / sample_rate)),
        "mean_value": float(np.sqrt((x * x).mean())) if n else 0.0,  # RMS
    }
