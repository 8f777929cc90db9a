"""Multimodal plumbing: binary columns + Arrow-batched stub decode."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    return multimodal.attach_media(docs).cache()


def test_media_schema_and_refs(media):
    row = media.first()
    assert row.media_ref.startswith("md5:")
    assert bytes(row.media_bytes).decode("utf-8")  # round-trips as utf-8
    assert row.n_bytes == len(bytes(row.media_bytes))


def test_feature_extraction_deterministic(media):
    feats = multimodal.extract_media_features(media)
    rows = {r.doc_id: r for r in feats.collect()}
    sample = media.limit(5).collect()
    for m in sample:
        blob = bytes(m.media_bytes)
        w, h = multimodal._decode_stub(blob)
        r = rows[m.doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.checksum == hashlib.md5(blob).hexdigest()
        assert 64 <= r.width < 64 + 577 and 64 <= r.height < 64 + 577
        assert r.decoded is False


def test_real_decode_is_explicitly_stubbed(media):
    with pytest.raises(NotImplementedError):
        multimodal.extract_media_features(media, real_decode=True)


def test_feature_count_matches(media):
    assert multimodal.extract_media_features(media).count() == media.count()


# --------------------- real codec-free decode path (PPM/BMP/WAV, r3) -------

def _synth_media_df(spark):
    import numpy as np

    from gsccca_tax_records_scraper_spark.operators import mediacodec as mc

    rng = np.random.RandomState(7)
    img1 = rng.randint(0, 256, size=(24, 17, 3)).astype(np.uint8)
    img2 = rng.randint(0, 256, size=(9, 40, 3)).astype(np.uint8)
    t = np.arange(8000)
    wav = (np.sin(2 * np.pi * 440 * t / 16000) * 16384).astype(np.int16)
    rows = [
        (1, "m1", bytearray(mc.encode_ppm(img1)), "image/x-portable-pixmap", 0),
        (2, "m2", bytearray(mc.encode_bmp(img2)), "image/bmp", 0),
        (3, "m3", bytearray(mc.encode_wav(wav, 16000)), "audio/wav", 0),
        (4, "m4", bytearray(b"\x89PNG\r\n not decodable here"), "image/png", 0),
    ]
    return (
        spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        .withColumn("n_bytes", F.octet_length("media_bytes")),
        img1, img2, wav,
    )


def test_codec_roundtrips():
    import numpy as np

    from gsccca_tax_records_scraper_spark.operators import mediacodec as mc

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(13, 21, 3)).astype(np.uint8)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)
    s = (rng.randint(-30000, 30000, size=999)).astype(np.int16)
    got, sr = mc.decode_wav(mc.encode_wav(s, 22050))
    assert sr == 22050 and np.array_equal(got, s)
    assert mc.sniff(mc.encode_ppm(img)) == "image/x-portable-pixmap"
    assert mc.sniff(b"junk") == "application/octet-stream"


def test_real_feature_extraction(spark):
    import numpy as np

    media, img1, img2, wav = _synth_media_df(spark)
    rows = {r.doc_id: r for r in multimodal.extract_media_features_real(media).collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (17, 24, 3)
    assert rows[1].decoded and abs(rows[1].mean_value - float(img1.mean())) < 1e-9
    assert (rows[2].width, rows[2].height) == (40, 9)
    assert rows[2].decoded and abs(rows[2].mean_value - float(img2.mean())) < 1e-9
    assert rows[3].decoded and rows[3].sample_rate == 16000
    assert rows[3].duration_ms == 500  # 8000 samples @ 16 kHz
    x = wav.astype(np.float64) / 32768.0
    assert abs(rows[3].mean_value - float(np.sqrt((x * x).mean()))) < 1e-9
    # compressed format without a codec: honest decoded=False, row preserved
    assert rows[4].decoded is False and rows[4].mime == "application/octet-stream"


def test_thumbnail_resize(spark):
    import numpy as np

    from gsccca_tax_records_scraper_spark.operators import mediacodec as mc

    media, img1, img2, _ = _synth_media_df(spark)
    thumbs = {r.doc_id: r for r in multimodal.thumbnail_images(media, 8, 8).collect()}
    assert set(thumbs) == {1, 2}  # images only; wav + undecodable dropped
    got = mc.decode_ppm(bytes(thumbs[1].thumb_ppm))
    assert got.shape == (8, 8, 3)
    assert np.array_equal(got, mc.resize_nearest(img1, 8, 8))


# --------------------- PNG + PDF real decode (round 4) ---------------------

def test_png_roundtrip_and_filters():
    import struct
    import zlib

    import numpy as np

    from gsccca_tax_records_scraper_spark.operators import mediacodec as mc

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(23, 31, 3)).astype(np.uint8)
    png = mc.encode_png(img)
    assert mc.sniff(png) == "image/png"
    assert np.array_equal(mc.decode_png(png), img)
    gray = rng.randint(0, 256, size=(12, 7)).astype(np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(gray))[:, :, 0], gray)
    rgba = rng.randint(0, 256, size=(5, 6, 4)).astype(np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(rgba)), rgba)

    # hand-filtered PNG cycling ALL five filter types must reconstruct
    h, w, ch = 6, 5, 3
    pix = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    stride = w * ch
    rows, prev = [], np.zeros(stride, dtype=np.int64)
    for r in range(h):
        cur = pix[r].reshape(-1).astype(np.int64)
        f = r % 5
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:
            pred = np.zeros(stride, np.int64)
            for x in range(stride):
                a, b, c = left[x], prev[x], ul[x]
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred[x] = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt = cur - pred
        rows.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    hand = (mc._PNG_SIG + mc._png_chunk(b"IHDR", ihdr)
            + mc._png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + mc._png_chunk(b"IEND", b""))
    assert np.array_equal(mc.decode_png(hand), pix)

    # paletted PNG expands through PLTE
    pal = rng.randint(0, 256, size=(7, 3)).astype(np.uint8)
    idx = rng.randint(0, 7, size=(4, 6)).astype(np.uint8)
    raw = np.zeros((4, 7), np.uint8)
    raw[:, 1:] = idx
    p3 = (mc._PNG_SIG
          + mc._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 8, 3, 0, 0, 0))
          + mc._png_chunk(b"PLTE", pal.tobytes())
          + mc._png_chunk(b"IDAT", zlib.compress(raw.tobytes()))
          + mc._png_chunk(b"IEND", b""))
    assert np.array_equal(mc.decode_png(p3), pal[idx])

    # honest gates: interlaced and 16-bit raise
    with pytest.raises(mc.UnsupportedMediaError):
        mc.decode_png(mc._PNG_SIG
                      + mc._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
                      + mc._png_chunk(b"IDAT", zlib.compress(b"\x00" * 14)))
    with pytest.raises(mc.UnsupportedMediaError):
        mc.decode_png(mc._PNG_SIG
                      + mc._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
                      + mc._png_chunk(b"IDAT", zlib.compress(b"\x00" * 26)))


def test_pdf_roundtrip_and_pages_table(spark):
    import numpy as np

    from gsccca_tax_records_scraper_spark.operators import mediacodec as mc

    rng = np.random.RandomState(13)
    page1 = rng.randint(0, 256, size=(20, 15, 3)).astype(np.uint8)
    page2 = rng.randint(0, 256, size=(11, 9)).astype(np.uint8)[:, :, None]
    pdf = mc.pdf_from_images([page1, page2])
    assert mc.sniff(pdf) == "application/pdf"
    back = mc.decode_pdf_images(pdf)
    assert len(back) == 2
    assert np.array_equal(back[0], page1) and np.array_equal(back[1], page2)
    # xref offsets point at their objects (a real PDF reader can seek them)
    xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert pdf[xref_at:xref_at + 4] == b"xref"

    media = spark.createDataFrame(
        [(9, "pdf:1", bytearray(pdf), "application/pdf", len(pdf)),
         (10, "junk", bytearray(b"not a pdf"), "application/octet-stream", 9)],
        multimodal.MEDIA_SCHEMA,
    )
    rows = sorted(
        multimodal.pdf_pages_table(media).collect(), key=lambda r: r.page
    )
    assert [r.page for r in rows] == [0, 1] and all(r.doc_id == 9 for r in rows)
    assert (rows[0].width, rows[0].height, rows[0].channels) == (15, 20, 3)
    assert (rows[1].width, rows[1].height, rows[1].channels) == (9, 11, 1)
    got1 = mc.decode_png(bytes(rows[0].page_png))
    assert np.array_equal(got1, page1)
    assert abs(rows[1].mean_value - float(page2.mean())) < 1e-9


def test_png_in_real_features_and_thumbnails(spark):
    import numpy as np

    from gsccca_tax_records_scraper_spark.operators import mediacodec as mc

    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, size=(18, 25, 3)).astype(np.uint8)
    media = spark.createDataFrame(
        [(5, "png:1", bytearray(mc.encode_png(img)), "image/png", 0)],
        multimodal.MEDIA_SCHEMA,
    ).withColumn("n_bytes", F.octet_length("media_bytes"))
    r = multimodal.extract_media_features_real(media).collect()[0]
    assert r.decoded and r.mime == "image/png"
    assert (r.width, r.height, r.channels) == (25, 18, 3)
    assert abs(r.mean_value - float(img.mean())) < 1e-9
    t = multimodal.thumbnail_images(media, 8, 8).collect()[0]
    assert np.array_equal(
        mc.decode_ppm(bytes(t.thumb_ppm)), mc.resize_nearest(img, 8, 8)
    )


def test_synthesized_corpus_decodes_exactly(spark, sf001):
    """synthesize_media_corpus writes real PPM/BMP/PNG/WAV bytes; the real
    decoder must recover the closed-form features EXACTLY (the same formulas
    the media_features_decoded oracle recomputes in SQL)."""
    docs = spark.read.parquet(f"{sf001}/documents.parquet").limit(64)
    corpus = multimodal.synthesize_media_corpus(docs).cache()
    # blobs really are the claimed container formats
    from gsccca_tax_records_scraper_spark.operators import mediacodec

    for m in corpus.collect():
        assert mediacodec.sniff(bytes(m.media_bytes)) == m.mime
        assert m.n_bytes == len(bytes(m.media_bytes))

    feats = {r.doc_id: r for r in
             multimodal.extract_media_features_real(corpus).collect()}
    for d in docs.select("doc_id", "text").collect():
        h8 = int(hashlib.md5(d.text.encode()).hexdigest()[:8], 16)
        r = feats[d.doc_id]
        assert r.decoded is True
        if d.doc_id % 4 == 3:  # WAV
            n, amp = 16 + 8 * (h8 % 60), (h8 % 20001) - 10000
            assert (r.width, r.height, r.channels) == (0, 0, 0)
            assert r.sample_rate == 8000 and r.duration_ms == n // 8
            assert r.mean_value == abs(amp) / 32768.0  # exact by construction
        else:  # constant-fill raster
            assert r.width == 4 + h8 % 29 and r.height == 4 + (h8 >> 8) % 23
            assert r.channels == 3 and r.sample_rate == 0
            assert r.mean_value == float(h8 % 256)  # exact: constant array


def test_corrupt_blobs_mark_decoded_false_not_task_kill():
    """A truncated or corrupt crawled blob must come back decoded=False
    from the per-blob feature extractor (and yield no thumbnail/page
    rows), never propagate an exception that kills the Spark task."""
    import numpy as np

    from gsccca_tax_records_scraper_spark.operators import jpegcodec as J
    from gsccca_tax_records_scraper_spark.operators import mediacodec as mc
    from gsccca_tax_records_scraper_spark.operators.multimodal import (
        _real_features_one,
    )

    img = np.full((16, 16, 3), [40, 120, 220], dtype=np.uint8)
    jpeg = J.encode_jpeg(img, quality=90)
    png = mc.encode_png(img)
    corrupt = [
        jpeg[: len(jpeg) // 2],          # truncated mid-entropy-data
        jpeg[:6],                        # truncated mid-header
        png[:20],                        # truncated PNG chunk walk
        png[: len(png) // 2],            # truncated mid-IDAT zlib stream
    ]
    for blob in corrupt:
        out = _real_features_one(blob)
        assert out["decoded"] is False
    # intact blobs on the same path still decode
    assert _real_features_one(jpeg)["decoded"] is True
    assert _real_features_one(png)["decoded"] is True


def test_pdf_colorspace_gate():
    """Non-Gray/RGB Flate images (CMYK/Indexed/ICC) must take the honest
    UnsupportedMediaError gate, not reshape-guess into garbage pixels."""
    import numpy as np

    from gsccca_tax_records_scraper_spark.operators import mediacodec as mc

    page = np.full((8, 6, 3), 77, dtype=np.uint8)
    pdf = mc.pdf_from_images([page])
    cmyk = pdf.replace(b"/DeviceRGB", b"/DeviceCMYK")
    with pytest.raises(mc.UnsupportedMediaError):
        mc.decode_pdf_images(cmyk)
    # payload/dims mismatch is gated too (not a bare reshape error): claim
    # a taller image than the Flate stream actually carries
    taller = pdf.replace(b"/Height 8", b"/Height 9")
    with pytest.raises(mc.UnsupportedMediaError):
        mc.decode_pdf_images(taller)
