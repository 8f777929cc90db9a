"""Progressive JPEG decode (SOF2, operators/jpegcodec._prog_scan).

Validation strategy (no reference decoder in the container):
  1. hand-assembled successive-approximation fixtures — scan bits written
     out by hand from T.81 G.1.2, so decoder bugs cannot cancel against
     an encoder (DC Al=1->0 on negative values, AC first with an EOB run,
     AC refinement correction bits inside an EOB run);
  2. a spectral-selection re-packager that emits the SAME quantized
     coefficients as the sequential encoder, as a 3-scan progressive file
     (interleaved DC scan + per-component full-band AC scans) — decoded
     pixels must be BIT-IDENTICAL to the sequential decode of the same
     image, across grayscale, 4:4:4 and 4:2:0 layouts.
"""

import numpy as np
import pytest

from gsccca_tax_records_scraper_spark.operators import jpegcodec as J
from gsccca_tax_records_scraper_spark.operators import mediacodec as M


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _sof2_gray(h: int, w: int) -> bytes:
    return _seg(
        0xC2,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )


def _dht(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))


def _sos1(ss: int, se: int, ah: int, al: int, dc_t: int = 0, ac_t: int = 0) -> bytes:
    return _seg(0xDA, bytes([1, 1, (dc_t << 4) | ac_t, ss, se, (ah << 4) | al]))


_DQT_LUM = lambda: _seg(0xDB, b"\x00" + bytes(J._Q_LUM[J._ZIGZAG].astype(np.uint8)))


def test_progressive_dc_successive_approximation_hand_fixture():
    """8x16 gray, two blocks, quantized DC = +5 and -3, sent as a DC-first
    scan at Al=1 then a DC refinement at Al=0. Scan bits hand-derived:
    first scan codes diffs of (v >> 1) = [2, -4] -> '011'+'10', '100'+'011'
    (Annex K DC-lum canonical codes); refinement sends bit0 of each value
    (two's complement): 5&1=1, -3&1=1 -> '11'. The refinement must OR into
    the NEGATIVE stored value correctly (-4 | 1 == -3)."""
    blob = (
        b"\xff\xd8"
        + _DQT_LUM()
        + _sof2_gray(8, 16)
        + _dht(0, 0, J._DC_LUM_BITS, J._DC_LUM_VALS)
        + _sos1(0, 0, 0, 1)
        + bytes([0b01110100, 0b01111111])  # 011 10 100 011 + pad
        + _sos1(0, 0, 1, 0)
        + b"\xff\x00"  # bits '11' + 1-pad = 0xFF, stuffed
        + b"\xff\xd9"
    )
    out = J.decode_jpeg(blob)
    assert out.shape == (8, 16, 1)
    # DC-only blocks: pixel = DC * Q[0] / 8 + 128 = 5*16/8+128 / -3*16/8+128
    assert np.all(out[:, :8, 0] == 138)
    assert np.all(out[:, 8:, 0] == 122)


def test_progressive_ac_refinement_and_eob_run_hand_fixture():
    """8x16 gray, two blocks; block A has one AC coefficient (zigzag pos 1,
    true quantized value 3), block B all zero. Three scans: DC first
    (both diffs 0), AC first at Al=1 (sends 3>>1=1, then an EOB run of 2
    via RS=0x10 with a custom 3-symbol AC table), AC refinement at Al=0
    (EOB run of 2 whose in-run correction bit lifts A's 2 -> 3). Expected
    pixels = sequential decode of a hand-built SOF0 stream carrying the
    same coefficients."""
    ac_bits = [0, 3] + [0] * 14  # len-2 codes: '00'->0x01, '01'->0x00, '10'->0x10
    ac_vals = [0x01, 0x00, 0x10]
    prog = (
        b"\xff\xd8"
        + _DQT_LUM()
        + _sof2_gray(8, 16)
        + _dht(0, 0, J._DC_LUM_BITS, J._DC_LUM_VALS)
        + _dht(1, 0, ac_bits, ac_vals)
        + _sos1(0, 0, 0, 0)
        + bytes([0b00001111])  # DC diffs 0, 0 -> '00' '00' + pad
        + _sos1(1, 63, 0, 1)
        + bytes([0b00110011])  # '00'(0x01) '1'(amp) '10'(0x10) '0'(extra) + pad
        + _sos1(1, 63, 1, 0)
        + bytes([0b10011111])  # '10'(0x10) '0'(extra) '1'(correction) + pad
        + b"\xff\xd9"
    )
    seq = (
        b"\xff\xd8"
        + _DQT_LUM()
        + _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
        + _dht(0, 0, J._DC_LUM_BITS, J._DC_LUM_VALS)
        + _dht(1, 0, J._AC_LUM_BITS, J._AC_LUM_VALS)
        + _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
        # A: DC '00', AC (0,2)='01'+amp '11', EOB '1010'; B: DC '00', EOB '1010'
        + bytes([0b00011110, 0b10001010])
        + b"\xff\xd9"
    )
    out_p = J.decode_jpeg(prog)
    out_s = J.decode_jpeg(seq)
    assert out_p.shape == out_s.shape == (8, 16, 1)
    assert np.array_equal(out_p, out_s)


# ------------------------------------------------- spectral re-packager
def _as_progressive(pixels: np.ndarray, quality: int, subsample: bool) -> bytes:
    """Re-package the sequential encoder's quantized coefficients as a
    3-scan spectral-selection progressive file (interleaved DC scan +
    one full-band AC scan per component, Ah=Al=0). Reuses the module's
    quantization/huffman primitives but drives the PROGRESSIVE scan
    layout, so decode exercises _prog_scan's traversal (incl. subsampled
    non-interleaved scan grids) against a sequential ground truth."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    qlum = J._quality_scale(J._Q_LUM, quality)
    qchrom = J._quality_scale(J._Q_CHROM, quality)
    samp = [(1, 1)] if ch == 1 else ([(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    hp = -(-h // (8 * vmax)) * 8 * vmax
    wp = -(-w // (8 * hmax)) * 8 * hmax
    padded = np.pad(pixels.astype(np.float64), ((0, hp - h), (0, wp - w), (0, 0)),
                    mode="edge")
    full = [padded[..., 0]] if ch == 1 else list(np.moveaxis(J._rgb_to_ycbcr(padded), -1, 0))
    zz = []
    for c, ((hi, vi), q) in enumerate(zip(samp, [qlum] + [qchrom] * (ch - 1))):
        plane = full[c]
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            plane = plane.reshape(hp // ry, ry, wp // rx, rx).mean(axis=(1, 3))
        coefs = J._fdct_blocks(J._to_blocks(plane - 128.0))
        zz.append(np.round(coefs.reshape(-1, 64) / q.reshape(1, 64)).astype(np.int64)[:, J._ZIGZAG])
    dc_l = J._build_codes(J._DC_LUM_BITS, J._DC_LUM_VALS)
    dc_c = J._build_codes(J._DC_CHROM_BITS, J._DC_CHROM_VALS)
    ac_l = J._build_codes(J._AC_LUM_BITS, J._AC_LUM_VALS)
    ac_c = J._build_codes(J._AC_CHROM_BITS, J._AC_CHROM_VALS)
    mcux, mcuy = wp // (8 * hmax), hp // (8 * vmax)
    wbs = [mcux * hi for hi, _ in samp]

    # scan 1: interleaved DC-only (diff-coded, MCU order)
    wr = J._BitWriter()
    preds = [0] * ch
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for c, (hi, vi) in enumerate(samp):
            codes = dc_l if c == 0 else dc_c
            for by in range(vi):
                for bx in range(hi):
                    b = (my * vi + by) * wbs[c] + mx * hi + bx
                    diff = int(zz[c][b, 0]) - preds[c]
                    preds[c] = int(zz[c][b, 0])
                    size = J._size_cat(diff)
                    code, length = codes[size]
                    wr.write(code, length)
                    if size:
                        wr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    dc_scan = wr.flush()

    # per-component full-band AC scans, non-interleaved scan-grid order
    ac_scans = []
    for c, (hi, vi) in enumerate(samp):
        codes = ac_l if c == 0 else ac_c
        cw = (w * hi + hmax - 1) // hmax
        chh = (h * vi + vmax - 1) // vmax
        ws, hs = (cw + 7) // 8, (chh + 7) // 8
        wr = J._BitWriter()
        for row in range(hs):
            for col in range(ws):
                blk = zz[c][row * wbs[c] + col]
                run = 0
                nz = np.flatnonzero(blk[1:])
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = codes[0xF0]
                        wr.write(code, length)
                        run -= 16
                    size = J._size_cat(v)
                    code, length = codes[(run << 4) | size]
                    wr.write(code, length)
                    wr.write(v if v >= 0 else v + (1 << size) - 1, size)
                    run = 0
                if last < 63:
                    code, length = codes[0x00]  # EOB == EOB-run of 1
                    wr.write(code, length)
        ac_scans.append(wr.flush())

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + bytes(qlum[J._ZIGZAG].astype(np.uint8)))
    if ch > 1:
        out += _seg(0xDB, b"\x01" + bytes(qchrom[J._ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ch])
    for c, (hi, vi) in enumerate(samp):
        sof += bytes([c + 1, (hi << 4) | vi, 0 if c == 0 else 1])
    out += _seg(0xC2, sof)
    for tclass, tid, bits, vals in (
        (0, 0, J._DC_LUM_BITS, J._DC_LUM_VALS),
        (1, 0, J._AC_LUM_BITS, J._AC_LUM_VALS),
        (0, 1, J._DC_CHROM_BITS, J._DC_CHROM_VALS),
        (1, 1, J._AC_CHROM_BITS, J._AC_CHROM_VALS),
    )[: 2 if ch == 1 else 4]:
        out += _dht(tclass, tid, bits, vals)
    sos = bytes([ch])
    for c in range(ch):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += _seg(0xDA, sos + bytes([0, 0, 0x00]))
    out += dc_scan
    for c in range(ch):
        ac_t = 0 if c == 0 else 1
        out += _seg(0xDA, bytes([1, c + 1, ac_t, 1, 63, 0x00]))
        out += ac_scans[c]
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("shape", ["gray", "444", "420"])
def test_progressive_matches_sequential(shape):
    h, w = 37, 61
    yy, xx = np.mgrid[0:h, 0:w]
    if shape == "gray":
        img = ((yy * xx) % 256).astype(np.uint8)
        seq_blob = J.encode_jpeg(img, quality=85)
        prog_blob = _as_progressive(img, 85, subsample=False)
    else:
        img = np.stack(
            [(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], axis=-1
        ).astype(np.uint8)
        sub = shape == "420"
        seq_blob = J.encode_jpeg(img, quality=85, subsample=sub)
        prog_blob = _as_progressive(img, 85, subsample=sub)
    assert M.sniff(prog_blob) == "image/jpeg"
    out_s = J.decode_jpeg(seq_blob)
    out_p = J.decode_jpeg(prog_blob)
    assert np.array_equal(out_p, out_s), (
        f"{shape}: progressive decode diverges from sequential"
    )


def test_arithmetic_coding_still_gated():
    sof9 = (
        b"\xff\xd8" + _seg(0xC9, bytes([8]) + (8).to_bytes(2, "big")
                           + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    )
    with pytest.raises(M.UnsupportedMediaError):
        J.decode_jpeg(sof9)
