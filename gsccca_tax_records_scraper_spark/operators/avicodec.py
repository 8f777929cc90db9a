"""Dependency-free AVI (RIFF) video container codec: MJPG and uncompressed
DIB streams — the two video shapes decodable without an external codec
library (MJPG frames are baseline/progressive JPEG, handled by the
from-scratch T.81 implementation in `operators/jpegcodec`; DIB frames are
BMP-style rasters). Closes the video half of the multimodal plumbing
(SURVEY §2 "multimodal columns"; the reference's media artifacts are
PNG->PDF, lien_index_scraper.py:687-708 — video has no reference analog,
so this is a training-data-pipeline capability, like frame sampling for
vision-model corpora).

Container layout implemented from the public AVI RIFF spec (MSDN
"AVI RIFF File Reference"):

  RIFF('AVI '
    LIST('hdrl'
      'avih'(MainAVIHeader: 14 DWORDs — usec/frame, max bytes/sec,
             padding, flags, total frames, initial frames, streams,
             suggested buffer, width, height, reserved[4])
      LIST('strl'
        'strh'(AVIStreamHeader: fccType 'vids', fccHandler, flags,
               priority, initial frames, scale, rate, start, length,
               suggested buffer, quality, sample size, rcFrame)
        'strf'(BITMAPINFOHEADER: 40 bytes, biCompression = 'MJPG'
               fourcc or 0 for DIB)))
    LIST('movi' '00dc'/'00db' frame chunks, word-aligned)
    'idx1'(AVIOLDINDEX entries: ckid, flags, offset, length))

Decoder scope: single 'vids' stream, MJPG or uncompressed 24bpp DIB
frames. Other handlers (H.264/cinepak/...) raise UnsupportedMediaError —
the honest gate, same policy as arithmetic-coded JPEG.

Frame rate is carried twice, as the spec does: avih.dwMicroSecPerFrame
and strh (dwScale, dwRate) with fps = rate/scale; the reader prefers the
stream header and falls back to the main header.
"""

from __future__ import annotations

import struct

import numpy as np

from .mediacodec import UnsupportedMediaError

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def _dib_frame(frame: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> bottom-up BGR raster, rows padded to 4 bytes
    (the BMP/DIB convention, mediacodec.encode_bmp:331)."""
    h, w, _ = frame.shape
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def _undib_frame(body: bytes, w: int, h: int, topdown: bool = False) -> np.ndarray:
    """Raster -> (h, w, 3) RGB. Bottom-up (positive biHeight, the common
    case) is row-reversed; a top-down DIB (negative biHeight in strf) is
    already in natural row order, so only the BGR->RGB swap applies."""
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(body, dtype=np.uint8, count=row_size * h).reshape(h, row_size)
    img = rows[:, : w * 3].reshape(h, w, 3)
    return img[:, :, ::-1] if topdown else img[::-1, :, ::-1]


def encode_avi(
    frames: list[np.ndarray], fps: int = 10, codec: str = "MJPG", quality: int = 90
) -> bytes:
    """(h, w, 3) uint8 RGB frames -> AVI blob. codec='MJPG' entropy-codes
    each frame as baseline JPEG (lossy, jpegcodec.encode_jpeg; grayscale
    (h, w, 1) frames allowed); codec='DIB' stores raw 24bpp rasters
    (lossless, RGB only). All frames must share one geometry."""
    assert frames and fps > 0
    h, w, c = frames[0].shape
    assert all(f.shape == (h, w, c) and f.dtype == np.uint8 for f in frames)
    if codec == "MJPG":
        from . import jpegcodec

        assert c in (1, 3)
        handler, compression = b"MJPG", struct.unpack("<I", b"MJPG")[0]
        payloads = [
            jpegcodec.encode_jpeg(f[:, :, 0] if c == 1 else f, quality=quality)
            for f in frames
        ]
        ckid = b"00dc"
        bitcount = 8 * c
    elif codec == "DIB":
        assert c == 3
        handler, compression = b"DIB ", 0
        payloads = [_dib_frame(f) for f in frames]
        ckid = b"00db"
        bitcount = 24
    else:
        raise ValueError(f"codec {codec!r}: MJPG or DIB")
    max_payload = max(len(p) for p in payloads)

    avih = struct.pack(
        "<10I4I",
        round(1_000_000 / fps), max_payload * fps, 0, _AVIF_HASINDEX,
        len(frames), 0, 1, max_payload, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIIIIIIIIII4h",
        b"vids", handler, 0, 0, 0,
        1, fps,  # dwScale, dwRate: fps = rate/scale
        0, len(frames), max_payload, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bitcount, compression,
        max_payload if codec == "MJPG" else ((w * 3 + 3) & ~3) * h,
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl", _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    )
    # idx1 offsets are relative to the 'movi' fourcc position (the
    # spec-common convention: offset of the frame's ckid minus fourcc pos)
    movi_body, idx_entries, off = b"", b"", 4
    for p in payloads:
        idx_entries += struct.pack("<4sIII", ckid, _AVIIF_KEYFRAME, off, len(p))
        piece = _chunk(ckid, p)
        movi_body += piece
        off += len(piece)
    body = hdrl + _list(b"movi", movi_body) + _chunk(b"idx1", idx_entries)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def _walk_chunks(blob: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        yield cid, pos + 8, min(pos + 8 + size, end)
        pos += 8 + size + (size & 1)


def parse_avi(blob: bytes) -> dict:
    """Container metadata + frame payload SPANS, no frame decode and no
    payload copies: width, height, fps, n_frames, handler, bitcount,
    frame_spans (list of (offset, length) into the blob). Cheap enough
    for the header-only feature path; frame decode is separate
    (`decode_avi_frames`), which slices only the requested frames — the
    property behind the O(sampled) sampling claim.

    Stream scoping: handler/compression/bitcount come from the FIRST
    'vids' stream's strh + its own strl's strf — a later audio stream's
    strf (WAVEFORMAT, also >= 40 bytes in its extensible shape) must not
    overwrite the video compression. Frame chunks wrapped in LIST('rec ')
    groups (interleaved AVIs, AVIF_ISINTERLEAVED) are descended into."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise UnsupportedMediaError("not a RIFF/AVI")
    meta: dict = {"handler": b"", "compression": 0, "bitcount": 0, "frame_spans": []}
    fps_main = fps_stream = 0.0
    seen_vids = False

    def walk_movi(a: int, b: int) -> None:
        for cid2, a2, b2 in _walk_chunks(blob, a, b):
            if cid2 == b"LIST" and blob[a2 : a2 + 4] == b"rec ":
                walk_movi(a2 + 4, b2)
            elif cid2[2:4] in (b"dc", b"db"):
                meta["frame_spans"].append((a2, b2 - a2))

    for cid, a, b in _walk_chunks(blob, 12, len(blob)):
        if cid != b"LIST":
            continue
        ltype = blob[a : a + 4]
        if ltype == b"hdrl":
            for cid2, a2, b2 in _walk_chunks(blob, a + 4, b):
                if cid2 == b"avih" and b2 - a2 >= 40:
                    usec, _mb, _pad, _fl, total, _init, _ns, _buf, w, h = (
                        struct.unpack_from("<10I", blob, a2)
                    )
                    meta.update(width=int(w), height=int(h), n_frames=int(total))
                    fps_main = 1_000_000.0 / usec if usec else 0.0
                elif cid2 == b"LIST" and blob[a2 : a2 + 4] == b"strl":
                    this_is_vids = False
                    for cid3, a3, b3 in _walk_chunks(blob, a2 + 4, b2):
                        if cid3 == b"strh" and b3 - a3 >= 48:
                            fcc_type, handler = struct.unpack_from("<4s4s", blob, a3)
                            scale, rate = struct.unpack_from("<II", blob, a3 + 20)
                            if fcc_type == b"vids" and not seen_vids:
                                seen_vids = this_is_vids = True
                                meta["handler"] = handler
                                fps_stream = rate / scale if scale else 0.0
                        elif cid3 == b"strf" and this_is_vids and b3 - a3 >= 40:
                            # biHeight (offset 8) is SIGNED: negative means a
                            # top-down raster — decoded unflipped, not garbage
                            meta["topdown"] = struct.unpack_from("<i", blob, a3 + 8)[0] < 0
                            meta["bitcount"] = struct.unpack_from("<H", blob, a3 + 14)[0]
                            meta["compression"] = struct.unpack_from("<I", blob, a3 + 16)[0]
        elif ltype == b"movi":
            walk_movi(a + 4, b)
    if "width" not in meta:
        raise UnsupportedMediaError("AVI without avih header")
    meta["fps"] = fps_stream or fps_main
    meta["n_frames"] = meta.get("n_frames") or len(meta["frame_spans"])
    return meta


def _decode_one(meta: dict, payload: bytes) -> np.ndarray:
    handler = meta["handler"].upper()
    # biCompression fourcc is matched case-insensitively — wild AVIs often
    # carry lowercase 'mjpg' with a blank/odd handler
    compression_fcc = struct.pack("<I", meta["compression"]).upper()
    if handler == b"MJPG" or compression_fcc == b"MJPG":
        from . import jpegcodec

        return jpegcodec.decode_jpeg(payload)
    if handler in (b"DIB ", b"RGB ", b"\x00\x00\x00\x00") and meta["compression"] == 0:
        # same honest gate as mediacodec.decode_bmp: only 24bpp rasters —
        # a 32bpp BGRA stream misread as BGR would decode to garbage
        if meta["bitcount"] != 24:
            raise UnsupportedMediaError(f"DIB bitcount={meta['bitcount']} (24 only)")
        return _undib_frame(
            payload, meta["width"], meta["height"], meta.get("topdown", False)
        )
    raise UnsupportedMediaError(f"AVI handler {handler!r} needs a codec library")


def decode_avi_frames(
    blob: bytes, indices: list[int] | None = None, meta: dict | None = None
):
    """Yield (frame_index, (h, w, c) uint8) for the requested frame indices
    (all frames when None; c=1 for grayscale MJPG). Only the requested
    frames are sliced out of the blob and decoded — the sampling path pays
    per SAMPLED frame, not per stored frame. Pass an already-parsed `meta`
    to skip re-walking the container."""
    if meta is None:
        meta = parse_avi(blob)
    want = set(indices) if indices is not None else None
    for i, (off, ln) in enumerate(meta["frame_spans"]):
        if want is not None and i not in want:
            continue
        yield i, _decode_one(meta, blob[off : off + ln])


def video_features(blob: bytes) -> dict:
    """Header-level features + a genuine first-frame decode (the cheap
    evidence the stream is actually decodable, not just well-formed).
    A header-valid container with zero frame chunks is NOT a decode —
    it raises, so the caller's decoded=False path reports it honestly."""
    meta = parse_avi(blob)
    fps = meta["fps"]
    n = len(meta["frame_spans"])
    if n == 0:
        raise UnsupportedMediaError("AVI with no frame chunks in movi")
    off, ln = meta["frame_spans"][0]
    first = _decode_one(meta, blob[off : off + ln])
    return {
        "width": int(meta["width"]),
        "height": int(meta["height"]),
        "channels": int(first.shape[2]),
        "sample_rate": int(round(fps)),  # frames/sec in the audio slot
        "duration_ms": int(round(n * 1000.0 / fps)) if fps else 0,
        "mean_value": float(first.mean()),
    }
