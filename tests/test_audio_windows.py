"""Windowed audio features (multimodal.audio_window_features): RMS /
zero-crossings / dominant frequency over synthesized sines whose ground
truth is closed-form."""

from __future__ import annotations

import numpy as np
import pytest

from gsccca_tax_records_scraper_spark.operators import mediacodec, multimodal

RATE = 8000


def _sine_wav(freq: float, seconds: float, amp: float = 0.5, rate: int = RATE) -> bytes:
    t = np.arange(int(rate * seconds)) / rate
    samples = np.round(amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    return mediacodec.encode_wav(samples, rate)


@pytest.fixture(scope="module")
def audio_media(spark):
    rows = [
        # 440 Hz for 1 s: 4 windows @ 250 ms
        (1, "md5:a440", bytearray(_sine_wav(440.0, 1.0)), "audio/wav", 0),
        # 1000 Hz, quiet
        (2, "md5:a1k", bytearray(_sine_wav(1000.0, 0.5, amp=0.1)), "audio/wav", 0),
        # too short for one 250 ms window (dropped entirely)
        (3, "md5:short", bytearray(_sine_wav(440.0, 0.1)), "audio/wav", 0),
        # non-audio blob (skipped)
        (4, "md5:text", bytearray(b"not audio"), "text/plain", 9),
    ]
    rows = [(d, r, b, m, len(b)) for d, r, b, m, _ in rows]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).cache()


def test_windowed_sine_features(audio_media):
    out = multimodal.audio_window_features(audio_media, window_ms=250).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(by_doc) == [1, 2]  # short + non-audio contribute no rows

    a = sorted(by_doc[1], key=lambda r: r.window_index)
    assert [r.window_index for r in a] == [0, 1, 2, 3]
    assert [r.t_ms for r in a] == [0, 250, 500, 750]
    win = RATE * 250 // 1000  # 2000 samples -> 4 Hz bins
    for r in a:
        assert abs(r.rms - 0.5 / np.sqrt(2)) < 0.002
        assert abs(r.dominant_hz - 440.0) <= RATE / win  # within one bin
        # a 440 Hz sine crosses zero ~2*440 times/sec -> ~220 per 250 ms
        assert abs(r.zero_crossings - 220) <= 2

    q = sorted(by_doc[2], key=lambda r: r.window_index)
    assert len(q) == 2
    for r in q:
        assert abs(r.rms - 0.1 / np.sqrt(2)) < 0.002
        assert abs(r.dominant_hz - 1000.0) <= RATE / win


def test_overlapping_hop(audio_media):
    out = [
        r for r in multimodal.audio_window_features(
            audio_media, window_ms=250, hop_ms=125
        ).collect()
        if r.doc_id == 1
    ]
    # 1 s clip, 250 ms windows every 125 ms -> floor((8000-2000)/1000)+1 = 7
    assert sorted(r.window_index for r in out) == list(range(7))
    assert sorted(r.t_ms for r in out) == [0, 125, 250, 375, 500, 625, 750]


def test_gapped_hop_larger_than_window(audio_media):
    # hop > window = sparse sampling (the audio analog of every_n)
    out = [
        r for r in multimodal.audio_window_features(
            audio_media, window_ms=250, hop_ms=500
        ).collect()
        if r.doc_id == 1
    ]
    assert sorted(r.t_ms for r in out) == [0, 500]
    for r in out:
        assert abs(r.rms - 0.5 / np.sqrt(2)) < 0.002


def test_zero_rate_blob_contributes_no_rows(spark):
    # a corrupt fmt chunk with sample_rate=0 must be skipped per-row,
    # never ZeroDivisionError the task
    blob = bytearray(_sine_wav(440.0, 0.5))
    at = bytes(blob).find(b"fmt ") + 8 + 4  # fmt body: format(2)+channels(2)+rate(4)
    blob[at : at + 4] = (0).to_bytes(4, "little")
    df = spark.createDataFrame(
        [(8, "md5:zr", blob, "audio/wav", len(blob)),
         (1, "md5:ok", bytearray(_sine_wav(440.0, 0.5)), "audio/wav", 0)],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.audio_window_features(df, window_ms=250).collect()
    assert {r.doc_id for r in rows} == {1}  # good blob unaffected


def test_stereo_mixdown(spark):
    # identical L/R channels: mixdown must equal the mono signal
    t = np.arange(RATE // 2) / RATE
    mono = np.round(0.4 * 32767 * np.sin(2 * np.pi * 200.0 * t)).astype(np.int16)
    stereo = np.stack([mono, mono], axis=1).reshape(-1)
    blob = (
        b"RIFF" + (4 + 8 + 16 + 8 + stereo.nbytes).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + int(1).to_bytes(2, "little") + int(2).to_bytes(2, "little")
        + RATE.to_bytes(4, "little") + (RATE * 4).to_bytes(4, "little")
        + int(4).to_bytes(2, "little") + int(16).to_bytes(2, "little")
        + b"data" + stereo.nbytes.to_bytes(4, "little") + stereo.tobytes()
    )
    df = spark.createDataFrame(
        [(7, "md5:st", bytearray(blob), "audio/wav", len(blob))],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.audio_window_features(df, window_ms=250).collect()
    assert len(rows) == 2
    for r in rows:
        assert abs(r.rms - 0.4 / np.sqrt(2)) < 0.002
        assert abs(r.dominant_hz - 200.0) <= RATE / (RATE * 250 // 1000)
