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
