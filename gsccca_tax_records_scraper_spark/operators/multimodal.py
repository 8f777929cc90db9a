"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns with typed metadata — the engine's
span model already carries them as content-addressed `media_ref` strings
(SURVEY §1.1 "Media store"; reference stores PNG/PDF blobs on disk and
filenames in rows, lien_index_scraper.py:687-711). These operators provide
the Spark-side plumbing for decode / feature-extract over such columns:
schema, batch shape, partitioning, and Arrow-batched pandas processing are
real; the actual codec step is STUBBED (this container has no image/audio
libraries) behind an import-try + a deterministic fake, clearly marked.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_ref string, media_bytes binary, mime string, n_bytes int"
)
FEATURE_SCHEMA = (
    "doc_id long, media_ref string, mime string, n_bytes int, "
    "width int, height int, checksum string, decoded boolean"
)

try:  # real decoder path — not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def attach_media(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from a text corpus: the bytes are
    the utf-8 text (a stand-in blob), media_ref its content hash. At 100 TB
    the blobs live out-of-band; only refs + bytes-in-flight appear here."""
    return documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.concat(F.lit("md5:"), F.md5(F.col(text_col))).alias("media_ref"),
        F.encode(F.col(text_col), "utf-8").alias("media_bytes"),
        F.lit("image/fake").alias("mime"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


def _decode_stub(blob: bytes) -> tuple[int, int]:
    """Deterministic fake decode: pretend dimensions derived from the
    content hash (md5 so the DuckDB oracle can reproduce them). The real
    implementation would be `Image.open(io.BytesIO(blob)).size`."""
    h = int(hashlib.md5(blob).hexdigest()[:8], 16)
    return 64 + h % 577, 64 + (h >> 16) % 577


def extract_media_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary media columns. Arrow moves
    the blobs in columnar batches (session arrow.maxRecordsPerBatch rows per
    pandas batch). real_decode=True requires a codec library; this container
    has none, so that path raises NotImplementedError — the stub path keeps
    the schema / partitioning / batch shape real and oracle-checkable."""
    if real_decode and not _HAS_PIL:
        raise NotImplementedError("no image codec library in this container")

    def run(it):
        for pdf in it:
            if pdf.empty:
                continue
            blobs = pdf["media_bytes"].map(bytes)
            dims = blobs.map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "checksum": blobs.map(lambda b: hashlib.md5(b).hexdigest()),
                    "decoded": False,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
