"""Baseline JPEG codec (operators/jpegcodec): roundtrips, the honest
unsupported gates, a hand-assembled T.81 fixture that validates the
DECODER independently of the encoder (self-consistent encode/decode bugs
would cancel in a roundtrip; spec-derived bits cannot), and the
multimodal dispatch."""

import numpy as np
import pytest

from gsccca_tax_records_scraper_spark.operators import jpegcodec as J
from gsccca_tax_records_scraper_spark.operators import mediacodec as M


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255.0**2 / np.mean(err * err))


def test_sniff_jpeg():
    blob = J.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    assert M.sniff(blob) == "image/jpeg"


def test_roundtrip_flat_color_exact():
    # one quantized DC per block, zero AC: decode is exact
    flat = np.full((16, 24, 3), [200, 64, 30], dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(flat, quality=90))
    assert out.shape == (16, 24, 3)
    assert int(np.abs(out.astype(int) - flat.astype(int)).max()) == 0


def test_roundtrip_gradient_odd_dims():
    h, w = 37, 61  # forces edge-replicate padding on both axes
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert _psnr(out, img) > 40.0


def test_roundtrip_noise_and_quality_ordering():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    hi = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    lo = J.decode_jpeg(J.encode_jpeg(img, quality=30))
    assert _psnr(hi, img) > 30.0
    assert _psnr(hi, img) > _psnr(lo, img)
    assert len(J.encode_jpeg(img, quality=30)) < len(J.encode_jpeg(img, quality=95))


def test_roundtrip_grayscale():
    yy, xx = np.mgrid[0:24, 0:40]
    g = ((yy * xx) % 256).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(g, quality=90))
    assert out.shape == (24, 40, 1)
    assert _psnr(out[:, :, 0], g) > 30.0


def test_unsupported_gates():
    with pytest.raises(M.UnsupportedMediaError):
        J.decode_jpeg(b"\x00\x01not a jpeg")
    # progressive frame: SOI + minimal SOF2 must be rejected, not misdecoded
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + (11).to_bytes(2, "big")
        + bytes([8])
        + (8).to_bytes(2, "big")
        + (8).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    with pytest.raises(M.UnsupportedMediaError):
        J.decode_jpeg(sof2)
    # sampling factors above 2 (T.81 allows up to 4): honest gate
    blob = bytearray(J.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 11] = 0x33  # luma sampling factor 3x3
    with pytest.raises(M.UnsupportedMediaError):
        J.decode_jpeg(bytes(blob))


def test_roundtrip_420_subsampled():
    h, w = 37, 61  # odd dims force MCU (16x16) edge padding
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    b444 = J.encode_jpeg(img, quality=90)
    b420 = J.encode_jpeg(img, quality=90, subsample=True)
    assert len(b420) < len(b444)  # half the chroma blocks
    out = J.decode_jpeg(b420)
    assert out.shape == img.shape
    assert _psnr(out, img) > 35.0
    # flat color survives subsampling exactly (chroma constant)
    flat = np.full((16, 24, 3), [200, 64, 30], dtype=np.uint8)
    rt = J.decode_jpeg(J.encode_jpeg(flat, quality=90, subsample=True))
    assert int(np.abs(rt.astype(int) - flat.astype(int)).max()) == 0


def test_decode_422_sampling():
    """4:2:2 (luma 2x1) exercises asymmetric sampling the encoder never
    emits: build it by hand-driving the encoder internals' layout — a
    flat image keeps every component DC-only so the expected pixels are
    exact."""
    flat = np.full((8, 32, 3), [120, 180, 60], dtype=np.uint8)
    # encode 4:2:0 then decode is covered above; for 2x1 craft via encode
    # path: temporarily emulate by subsampling horizontally only
    ycc = J._rgb_to_ycbcr(flat.astype(np.float64))
    y, cb, cr = (ycc[..., i] for i in range(3))
    cb2 = cb.reshape(8, 16, 2).mean(axis=2)
    cr2 = cr.reshape(8, 16, 2).mean(axis=2)
    qlum = J._quality_scale(J._Q_LUM, 90)
    qchrom = J._quality_scale(J._Q_CHROM, 90)

    def qzz(plane, q):
        coef = J._fdct_blocks(J._to_blocks(plane - 128.0))
        return np.round(coef.reshape(-1, 64) / q.reshape(1, 64)).astype(np.int64)[
            :, J._ZIGZAG
        ]

    zy, zcb, zcr = qzz(y, qlum), qzz(cb2, qchrom), qzz(cr2, qchrom)
    dc_l = J._build_codes(J._DC_LUM_BITS, J._DC_LUM_VALS)
    ac_l = J._build_codes(J._AC_LUM_BITS, J._AC_LUM_VALS)
    dc_c = J._build_codes(J._DC_CHROM_BITS, J._DC_CHROM_VALS)
    ac_c = J._build_codes(J._AC_CHROM_BITS, J._AC_CHROM_VALS)
    wr = J._BitWriter()
    preds = [0, 0, 0]
    for m in range(2):  # 2 MCUs of 16x8: Y blocks (2m, 2m+1), chroma block m
        preds[0] = J._encode_plane(wr, zy[2 * m : 2 * m + 1], dc_l, ac_l, preds[0])
        preds[0] = J._encode_plane(wr, zy[2 * m + 1 : 2 * m + 2], dc_l, ac_l, preds[0])
        preds[1] = J._encode_plane(wr, zcb[m : m + 1], dc_c, ac_c, preds[1])
        preds[2] = J._encode_plane(wr, zcr[m : m + 1], dc_c, ac_c, preds[2])
    entropy = wr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    blob = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes(qlum[J._ZIGZAG].astype(np.uint8)))
        + seg(0xDB, b"\x01" + bytes(qchrom[J._ZIGZAG].astype(np.uint8)))
        + seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (32).to_bytes(2, "big")
              + bytes([3, 1, 0x21, 0, 2, 0x11, 1, 3, 0x11, 1]))
        + seg(0xC4, bytes([0x00]) + bytes(J._DC_LUM_BITS) + bytes(J._DC_LUM_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(J._AC_LUM_BITS) + bytes(J._AC_LUM_VALS))
        + seg(0xC4, bytes([0x01]) + bytes(J._DC_CHROM_BITS) + bytes(J._DC_CHROM_VALS))
        + seg(0xC4, bytes([0x11]) + bytes(J._AC_CHROM_BITS) + bytes(J._AC_CHROM_VALS))
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
        + entropy
        + b"\xff\xd9"
    )
    out = J.decode_jpeg(blob)
    assert out.shape == (8, 32, 3)
    assert int(np.abs(out.astype(int) - flat.astype(int)).max()) <= 2


def test_decoder_against_hand_assembled_t81_fixture():
    """A single 8x8 grayscale block assembled bit-by-bit from T.81 + Annex K
    (no use of the encoder): flat gray level 130.

    level shift: 130 - 128 = 2 -> orthonormal DC = 2*8 = 16; quality-50
    luminance table has Q[0] = 16 -> quantized DC = 1, all AC zero.
    Entropy bits: DC size category 1 = code 010 (Annex K DC-lum canonical:
    len-2 '00'->0, len-3 '010'->1); amplitude bit '1'; EOB = '1010'
    (Annex K AC-lum code for 0x00). Stream = 010 1 1010 -> 0x5A exactly.
    Decode must reproduce DC*Q = 16 -> IDCT -> 2 -> +128 = 130 everywhere.
    """
    qtab_zz = bytes(J._Q_LUM[J._ZIGZAG].astype(np.uint8))  # quality-50 base

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    blob = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + qtab_zz)
        + seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
              + bytes([1, 1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(J._DC_LUM_BITS) + bytes(J._DC_LUM_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(J._AC_LUM_BITS) + bytes(J._AC_LUM_VALS))
        + seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
        + b"\x5a"
        + b"\xff\xd9"
    )
    out = J.decode_jpeg(blob)
    assert out.shape == (8, 8, 1)
    assert np.all(out == 130)


def test_byte_stuffing_survives_roundtrip():
    # images whose entropy stream contains 0xFF bytes must destuff cleanly;
    # brute-force a few seeds so at least one stream contains 0xFF
    rng = np.random.default_rng(11)
    hit = False
    for _ in range(8):
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        blob = J.encode_jpeg(img, quality=95)
        body = blob[blob.find(b"\xff\xda") + 14 : -2]
        hit = hit or b"\xff\x00" in body
        out = J.decode_jpeg(blob)
        assert _psnr(out, img) > 28.0
    assert hit, "no stuffed byte exercised across seeds"


def test_encode_time_linear_in_pixels():
    """Guards the bit-writer accumulator bug class: an unmasked
    accumulator turns encode quadratic in stream length (measured 102 s
    for a 512x512 noise image vs 0.8 s fixed). Noise maximizes the
    entropy-coded stream, so a generous wall bound catches any
    superlinear regression without flaking under CI contention."""
    import time

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    t0 = time.monotonic()
    blob = J.encode_jpeg(img, quality=85)
    assert time.monotonic() - t0 < 5.0
    assert _psnr(J.decode_jpeg(blob), img) > 20.0


def test_restart_marker_resync_hand_fixture():
    """DRI=1 + an RST0 between two MCUs: the decoder must byte-align and
    reset the DC predictor at the boundary (T.81 F.2.1.3.1). Bits
    hand-derived: block A DC=+5 (diff 5: '100'+'101', EOB '1010'), pad;
    RST0; block B DC=-3 coded as a FRESH diff (-3: '011'+'00', EOB),
    so a decoder that fails to reset the predictor produces 2 instead."""
    qtab_zz = bytes(J._Q_LUM[J._ZIGZAG].astype(np.uint8))

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    blob = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + qtab_zz)
        + seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
              + bytes([1, 1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(J._DC_LUM_BITS) + bytes(J._DC_LUM_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(J._AC_LUM_BITS) + bytes(J._AC_LUM_VALS))
        + seg(0xDD, (1).to_bytes(2, "big"))  # DRI: restart every MCU
        + seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
        + bytes([0b10010110, 0b10111111])  # '100 101 1010' + 1-pad
        + b"\xff\xd0"  # RST0
        + bytes([0b01100101, 0b01111111])  # '011 00 1010' + 1-pad
        + b"\xff\xd9"
    )
    out = J.decode_jpeg(blob)
    assert out.shape == (8, 16, 1)
    assert np.all(out[:, :8, 0] == 138)  # DC 5 * Q0 16 / 8 + 128
    assert np.all(out[:, 8:, 0] == 122)  # DC -3 -> 122 (not 132: pred reset)


def test_pdf_dctdecode_image_stream():
    """decode_pdf_images handles DCTDecode (embedded JPEG) XObjects — the
    img2pdf shape the reference's artifact chain produces — alongside the
    writer's own FlateDecode shape."""
    flat = np.full((16, 24, 3), [10, 200, 90], dtype=np.uint8)
    jpg = J.encode_jpeg(flat, quality=90)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Subtype /Image /Width 24 /Height 16"
        b" /ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode"
        b" /Length " + str(len(jpg)).encode() + b" >>\nstream\n" + jpg
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    pages = M.decode_pdf_images(pdf)
    assert len(pages) == 1
    assert pages[0].shape == (16, 24, 3)
    assert int(np.abs(pages[0].astype(int) - flat.astype(int)).max()) == 0


def test_multimodal_feature_dispatch():
    from gsccca_tax_records_scraper_spark.operators.multimodal import (
        _real_features_one,
    )

    img = np.full((12, 20, 3), 90, dtype=np.uint8)
    feats = _real_features_one(J.encode_jpeg(img, quality=90))
    assert feats["decoded"] is True
    assert feats["mime"] == "image/jpeg"
    assert (feats["width"], feats["height"], feats["channels"]) == (20, 12, 3)
    assert abs(feats["mean_value"] - 90.0) <= 1.0


def test_fill_bytes_before_marker():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker —
    spec-legal encoders emit them; the marker walk must skip, not
    misparse the pad as a marker code."""
    img = np.full((16, 16, 3), [90, 180, 40], dtype=np.uint8)
    clean = J.encode_jpeg(img, quality=90)
    i = clean.find(b"\xff\xc4")  # pad the first DHT marker
    assert i > 0
    padded = clean[:i] + b"\xff\xff\xff" + clean[i:]
    assert (J.decode_jpeg(padded) == J.decode_jpeg(clean)).all()


def test_truncated_blob_raises_catchable():
    """A JPEG cut mid-download must raise an exception the media
    operators' per-blob guards catch (decoded=False), never hang."""
    import struct
    import zlib

    img = np.full((16, 16, 3), [5, 99, 201], dtype=np.uint8)
    blob = J.encode_jpeg(img, quality=90)
    guarded = (M.UnsupportedMediaError, ValueError, IndexError, KeyError,
               struct.error, zlib.error)
    for cut in (3, len(blob) // 4, len(blob) // 2, len(blob) - 3):
        with pytest.raises(guarded):
            J.decode_jpeg(blob[:cut])
