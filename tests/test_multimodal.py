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
