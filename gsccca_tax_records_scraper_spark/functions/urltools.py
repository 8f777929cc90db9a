"""URL extraction, canonicalization, hashing (SURVEY F1/F2/F8, S3).

The reference collects anchors in one JS eval
(scrapers/lien_index_scraper.py:449-452), strips the
`fnSubmitThisForm('...')` JS wrapper and html-unescapes + urljoins each href
(:455-467; realestate_index_scraper.py:461-472). Here the same steps are
vectorized over Arrow batches (pandas .str ops) — no per-row Python UDFs in
the Spark plan; the only per-element Python is urljoin inside a pandas UDF,
which operates on whole Arrow batches.

url_id is a 60-bit id derived from sha1(url). It is computed identically
JVM-side (`url_id_col`: conv(substring(sha1(url),1,15),16,10)) and
Python-side (`url_id`), so the simulator, pandas UDFs and Catalyst
expressions all agree.
"""

from __future__ import annotations

import hashlib
import html as _html
import re
from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

N_HOST_BUCKETS = 64  # seen-set state shards; at 10^10 urls raise to ~4096

# JS wrapper: fnSubmitThisForm('<href>')  (lien_index_scraper.py:455-467)
JS_WRAPPER_RE = re.compile(r"fnSubmitThisForm\('([^']+)'\)")
# anchors of both pipelines: JS-wrapped and plain hrefs
HREF_RE = re.compile(
    r"""href=["'](?:javascript:fnSubmitThisForm\('([^']+)'\);?|([^"']+))["']"""
)


def url_id(url: str) -> int:
    """60-bit deterministic id; identical to `url_id_col` JVM-side."""
    return int(hashlib.sha1(url.encode("utf-8")).hexdigest()[:15], 16)


def url_id_col(url: Column) -> Column:
    """JVM-side url_id — whole-stage-codegen'd, no Python."""
    return F.conv(F.substring(F.sha1(url), 1, 15), 16, 10).cast("long")


def host_bucket_of(uid: int) -> int:
    return uid % N_HOST_BUCKETS


def host_bucket_col(uid: Column) -> Column:
    return (uid % F.lit(N_HOST_BUCKETS)).cast("int")


def extract_raw_hrefs(html_text: str) -> list[str]:
    """All candidate hrefs in SERP/detail html, in document order.
    JS-wrapped hrefs unwrap to their inner url (group 1); plain hrefs are
    group 2. Pure function — used by the simulator and inside pandas UDFs."""
    out = []
    for m in HREF_RE.finditer(html_text):
        href = m.group(1) or m.group(2)
        if href and not href.startswith("javascript:"):
            out.append(href)
    return out


def canonicalize(base_url: str, raw_href: str) -> str:
    """html.unescape + urljoin (lien_index_scraper.py:455-467)."""
    return urljoin(base_url, _html.unescape(raw_href.strip()))


def host_of(url: str) -> str:
    return urlparse(url).netloc.lower()


def is_junk(url: str) -> bool:
    """Junk-URL predicate: drop anything containing `maxrows`
    (case-insensitive; lien_index_scraper.py:540)."""
    return "maxrows" in url.lower()


# ---------------------------------------------------------------- pandas side

def canonicalize_series(base_urls: pd.Series, raw_hrefs: pd.Series) -> pd.Series:
    """Vectorized canonicalization over an Arrow batch."""
    unescaped = raw_hrefs.str.strip().map(_html.unescape)
    return pd.Series(
        [urljoin(b, h) for b, h in zip(base_urls, unescaped)],
        index=raw_hrefs.index,
        dtype="object",
    )


def url_id_series(urls: pd.Series) -> pd.Series:
    return urls.map(url_id).astype("int64")


def host_series(urls: pd.Series) -> pd.Series:
    # scheme://HOST/...  — pure string op, no urlparse per row
    return urls.str.extract(r"^[a-z]+://([^/]+)", expand=False).str.lower()


def extract_hrefs_series(html_texts: pd.Series) -> pd.Series:
    """Series[str html] -> Series[list[str] hrefs], document order preserved."""
    return html_texts.map(extract_raw_hrefs)
