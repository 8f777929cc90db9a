"""AVI container codec (operators/avicodec) + video frame sampling
(multimodal.sample_video_frames): DIB round-trips losslessly, MJPG frames
ride the from-scratch T.81 decoder, sampling decodes only the sampled
frames, and gated codecs / corrupt blobs degrade per-row, never per-task."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark.operators import avicodec, mediacodec, multimodal

RNG = np.random.default_rng(1234)


def _frames(n: int, h: int = 24, w: int = 34) -> list[np.ndarray]:
    return [RNG.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_dib_roundtrip_exact():
    frames = _frames(5)
    blob = avicodec.encode_avi(frames, fps=12, codec="DIB")
    assert mediacodec.sniff(blob) == "video/x-msvideo"
    meta = avicodec.parse_avi(blob)
    assert (meta["width"], meta["height"], meta["fps"], meta["n_frames"]) == (34, 24, 12.0, 5)
    for i, px in avicodec.decode_avi_frames(blob):
        assert (px == frames[i]).all()


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (33, 7), (34, 24), (64, 1)])
def test_dib_roundtrip_geometry_sweep(w, h):
    # odd widths exercise the 4-byte row-padding path; w=1/h=1 the edges
    frames = [RNG.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(2)]
    blob = avicodec.encode_avi(frames, fps=30, codec="DIB")
    for i, px in avicodec.decode_avi_frames(blob):
        assert (px == frames[i]).all()


def test_mjpg_frames_decode_via_jpegcodec():
    # smooth frames: DC-dominated blocks survive quantization ~exactly
    frames = [np.full((16, 16, 3), 40 + 30 * i, dtype=np.uint8) for i in range(4)]
    blob = avicodec.encode_avi(frames, fps=10, codec="MJPG", quality=95)
    meta = avicodec.parse_avi(blob)
    assert meta["handler"] == b"MJPG" and len(meta["frame_spans"]) == 4
    for i, px in avicodec.decode_avi_frames(blob):
        assert np.abs(px.astype(int) - frames[i].astype(int)).max() <= 3


def test_sampling_decodes_only_requested_indices():
    frames = _frames(10)
    blob = avicodec.encode_avi(frames, fps=5, codec="DIB")
    got = dict(avicodec.decode_avi_frames(blob, [0, 3, 9]))
    assert sorted(got) == [0, 3, 9]
    for i, px in got.items():
        assert (px == frames[i]).all()


def test_video_features_header_plus_first_frame():
    frames = [np.full((8, 12, 3), 77, dtype=np.uint8)] + _frames(9, 8, 12)
    blob = avicodec.encode_avi(frames, fps=20, codec="DIB")
    f = avicodec.video_features(blob)
    assert (f["width"], f["height"], f["channels"]) == (12, 8, 3)
    assert f["sample_rate"] == 20  # fps rides the audio slot
    assert f["duration_ms"] == 500  # 10 frames @ 20 fps
    assert f["mean_value"] == 77.0


def test_gated_handler_and_corrupt_blob():
    blob = avicodec.encode_avi(_frames(2), fps=10, codec="DIB")
    bad = bytearray(blob)
    h = blob.find(b"vids") + 4
    bad[h : h + 4] = b"H264"
    c = blob.find(b"strf") + 8 + 16
    bad[c : c + 4] = struct.pack("<I", 0x34363248)
    with pytest.raises(mediacodec.UnsupportedMediaError):
        avicodec.video_features(bytes(bad))
    with pytest.raises(mediacodec.UnsupportedMediaError):
        avicodec.parse_avi(blob[:20])
    with pytest.raises(ValueError):
        avicodec.encode_avi(_frames(1), fps=10, codec="H264")


def _patch(blob: bytes, marker: bytes, skip: int, new: bytes) -> bytes:
    out = bytearray(blob)
    at = blob.find(marker) + skip
    out[at : at + len(new)] = new
    return bytes(out)


def test_dib_bitcount_gate():
    # a 32bpp BGRA stream misread as BGR decodes to garbage — must raise,
    # mirroring mediacodec.decode_bmp's bpp gate
    blob = avicodec.encode_avi(_frames(2), fps=10, codec="DIB")
    bad = _patch(blob, b"strf", 8 + 14, struct.pack("<H", 32))
    with pytest.raises(mediacodec.UnsupportedMediaError):
        next(avicodec.decode_avi_frames(bad))
    with pytest.raises(mediacodec.UnsupportedMediaError):
        avicodec.video_features(bad)


def test_lowercase_mjpg_compression_blank_handler():
    # wild AVIs often carry lowercase 'mjpg' in biCompression with a
    # blank handler — the fourcc compare must be case-insensitive
    frames = [np.full((16, 16, 3), 40 + 30 * i, dtype=np.uint8) for i in range(3)]
    blob = avicodec.encode_avi(frames, fps=10, codec="MJPG", quality=95)
    h = blob.find(b"vids") + 4
    wild = _patch(blob, b"strf", 8 + 16, b"mjpg")
    wild = wild[:h] + b"\x00\x00\x00\x00" + wild[h + 4 :]
    assert avicodec.parse_avi(wild)["handler"] == b"\x00\x00\x00\x00"
    for i, px in avicodec.decode_avi_frames(wild):
        assert np.abs(px.astype(int) - frames[i].astype(int)).max() <= 3


def test_topdown_dib_decodes_unflipped():
    # negative biHeight in strf = top-down raster: rows are stored in
    # natural order, so the bottom-up row reversal must be skipped. The
    # encoder writes bottom-up rasters, so patching the sign flag onto an
    # unchanged body must yield the vertically flipped frame — exactly.
    frames = _frames(2, h=6, w=5)
    blob = avicodec.encode_avi(frames, fps=10, codec="DIB")
    top = _patch(blob, b"strf", 8 + 8, struct.pack("<i", -6))
    assert avicodec.parse_avi(top)["topdown"] is True
    for i, px in avicodec.decode_avi_frames(top):
        assert (px == frames[i][::-1]).all()


def test_audio_strf_does_not_clobber_video_compression():
    # DIB vids strl followed by an auds strl whose 40-byte strf has a
    # nonzero dword at offset 16 (e.g. WAVEFORMATEXTENSIBLE channel mask):
    # the video must still decode — strf is scoped to the vids strl
    frames = _frames(3)
    blob = avicodec.encode_avi(frames, fps=10, codec="DIB")
    strh = struct.pack(
        "<4s4sIIIIIIIIII4h", b"auds", b"\x00\x00\x00\x00",
        0, 0, 0, 1, 8000, 0, 8000, 0, 0, 2, 0, 0, 0, 0,
    )
    strf = b"\x00" * 16 + struct.pack("<I", 0x3) + b"\x00" * 20
    aud_strl = avicodec._list(
        b"strl", avicodec._chunk(b"strh", strh) + avicodec._chunk(b"strf", strf)
    )
    # splice the audio strl into hdrl right before the hdrl LIST ends:
    # grow the hdrl LIST body and the RIFF size accordingly
    hdrl_at = blob.find(b"hdrl") - 8
    hdrl_size = struct.unpack_from("<I", blob, hdrl_at + 4)[0]
    hdrl_end = hdrl_at + 8 + hdrl_size
    out = bytearray(blob[:hdrl_end] + aud_strl + blob[hdrl_end:])
    struct.pack_into("<I", out, hdrl_at + 4, hdrl_size + len(aud_strl))
    struct.pack_into("<I", out, 4, len(out) - 8)
    meta = avicodec.parse_avi(bytes(out))
    assert meta["compression"] == 0 and meta["bitcount"] == 24
    for i, px in avicodec.decode_avi_frames(bytes(out)):
        assert (px == frames[i]).all()


def test_rec_list_wrapped_movi_chunks():
    # interleaved AVIs wrap frame chunks in LIST('rec ') groups: the movi
    # walker must descend, not skip them
    frames = _frames(3)
    blob = avicodec.encode_avi(frames, fps=10, codec="DIB")
    movi_at = blob.find(b"LIST", 12)
    while blob[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = blob.find(b"LIST", movi_at + 4)
    movi_size = struct.unpack_from("<I", blob, movi_at + 4)[0]
    movi_body = blob[movi_at + 12 : movi_at + 8 + movi_size]
    wrapped = avicodec._list(b"movi", avicodec._list(b"rec ", movi_body))
    out = bytearray(blob[:movi_at] + wrapped + blob[movi_at + 8 + movi_size :])
    struct.pack_into("<I", out, 4, len(out) - 8)
    got = dict(avicodec.decode_avi_frames(bytes(out)))
    assert sorted(got) == [0, 1, 2]
    for i, px in got.items():
        assert (px == frames[i]).all()


def test_grayscale_mjpg_channels():
    frames = [np.full((16, 16, 1), 90, dtype=np.uint8) for _ in range(2)]
    blob = avicodec.encode_avi(frames, fps=5, codec="MJPG", quality=95)
    f = avicodec.video_features(blob)
    assert f["channels"] == 1  # not a hard-coded 3
    for _i, px in avicodec.decode_avi_frames(blob):
        assert px.shape == (16, 16, 1)
        assert abs(int(px.mean()) - 90) <= 3


def test_empty_movi_raises_not_fake_features():
    blob = avicodec.encode_avi(_frames(1), fps=10, codec="DIB")
    movi_at = blob.find(b"LIST", 12)
    while blob[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = blob.find(b"LIST", movi_at + 4)
    movi_size = struct.unpack_from("<I", blob, movi_at + 4)[0]
    out = bytearray(blob[:movi_at] + avicodec._list(b"movi", b"")
                    + blob[movi_at + 8 + movi_size :])
    struct.pack_into("<I", out, 4, len(out) - 8)
    with pytest.raises(mediacodec.UnsupportedMediaError):
        avicodec.video_features(bytes(out))


def test_no_rate_gives_null_timestamps(spark):
    blob = avicodec.encode_avi(
        [np.full((8, 8, 3), 50, dtype=np.uint8)] * 2, fps=10, codec="DIB"
    )
    # zero out both rate carriers: avih.dwMicroSecPerFrame and strh.dwScale/dwRate
    blob = _patch(blob, b"avih", 8, struct.pack("<I", 0))
    blob = _patch(blob, b"vids", 4 + 4 + 12, struct.pack("<II", 0, 0))
    assert avicodec.parse_avi(blob)["fps"] == 0.0
    df = spark.createDataFrame(
        [(9, "md5:norate", bytearray(blob), "video/x-msvideo", len(blob))],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.sample_video_frames(df).collect()
    assert len(rows) == 2 and all(r.t_ms is None for r in rows)
    assert all(r.mean_value == 50.0 for r in rows)


@pytest.fixture(scope="module")
def video_media(spark):
    """3 videos (one MJPG, one DIB, one codec-gated) + 1 non-video blob."""
    dib = avicodec.encode_avi(
        [np.full((10, 10, 3), 25 * (i + 1), dtype=np.uint8) for i in range(6)],
        fps=4, codec="DIB",
    )
    mjpg = avicodec.encode_avi(
        [np.full((12, 16, 3), 100, dtype=np.uint8) for _ in range(3)],
        fps=3, codec="MJPG", quality=95,
    )
    gated = bytearray(avicodec.encode_avi(_frames(2), fps=10, codec="DIB"))
    h = bytes(gated).find(b"vids") + 4
    gated[h : h + 4] = b"H264"
    c = bytes(gated).find(b"strf") + 8 + 16
    gated[c : c + 4] = struct.pack("<I", 0x34363248)
    rows = [
        (1, "md5:dib", bytearray(dib), "video/x-msvideo", len(dib)),
        (2, "md5:mjpg", bytearray(mjpg), "video/x-msvideo", len(mjpg)),
        (3, "md5:gated", gated, "video/x-msvideo", len(gated)),
        (4, "md5:text", bytearray(b"not a video at all"), "text/plain", 18),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).cache()


def test_sample_video_frames_operator(spark, video_media):
    out = multimodal.sample_video_frames(video_media, every_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # gated + non-video contribute no rows; DIB 6 frames @ every 2 -> 0,2,4
    assert sorted(by_doc) == [1, 2]
    d = sorted(by_doc[1], key=lambda r: r.frame_index)
    assert [r.frame_index for r in d] == [0, 2, 4]
    assert [r.t_ms for r in d] == [0, 500, 1000]  # 4 fps
    assert [r.mean_value for r in d] == [25.0, 75.0, 125.0]
    assert all((r.width, r.height, r.channels) == (10, 10, 3) for r in d)
    # the emitted frame_png re-decodes to the sampled frame
    px = mediacodec.decode_png(bytes(d[1].frame_png))
    assert (px == np.full((10, 10, 3), 75, dtype=np.uint8)).all()
    m = sorted(by_doc[2], key=lambda r: r.frame_index)
    assert [r.frame_index for r in m] == [0, 2]
    assert all(abs(r.mean_value - 100.0) <= 3 for r in m)


def test_sample_video_frames_max_frames(video_media):
    out = multimodal.sample_video_frames(video_media, every_n=1, max_frames=2).collect()
    counts = {}
    for r in out:
        counts[r.doc_id] = counts.get(r.doc_id, 0) + 1
    assert counts == {1: 2, 2: 2}


def test_real_features_video_branch(spark, video_media):
    rows = {r.doc_id: r for r in multimodal.extract_media_features_real(video_media).collect()}
    v = rows[1]
    assert v.decoded and v.mime == "video/x-msvideo"
    assert (v.width, v.height, v.channels) == (10, 10, 3)
    assert v.sample_rate == 4 and v.duration_ms == 1500
    assert v.mean_value == 25.0  # first frame
    assert rows[3].decoded is False  # gated handler: row survives
    assert rows[4].decoded is False  # non-video blob
