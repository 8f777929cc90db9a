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

# seen-set state shards (the DEFAULT fan-out; at 10^10 urls start at ~4096).
# The engine DOUBLES the fan-out at runtime when a bucket's seen count
# crosses its split threshold (dedup.split_seen_state; the committed value
# rides in the checkpoint manifest), so this is a starting point, not a cap.
N_HOST_BUCKETS = 64

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


def host_bucket_of(uid: int, n_buckets: int = N_HOST_BUCKETS) -> int:
    return uid % n_buckets


def host_bucket_col(uid: Column, n_buckets: int = N_HOST_BUCKETS) -> Column:
    return (uid % F.lit(n_buckets)).cast("int")


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


def canonicalize_frame(base_urls: pd.Series, raw_hrefs: pd.Series) -> pd.Series:
    """Vectorized canonicalize (strip + html.unescape + urljoin). The three
    href shapes that dominate any crawl — absolute http(s), root-relative
    `/path`, scheme-relative `//host/path` — resolve with pure pandas .str
    ops (each is exactly RFC-3986 urljoin for that shape); only the residue
    (relative paths, `?query`, fragments) falls back to per-row urljoin.
    Result-identical to `canonicalize` row-by-row (tested)."""
    s = raw_hrefs.str.strip()
    amp = s.str.contains("&", regex=False).to_numpy(dtype=bool)
    if amp.any():
        # html.unescape only where an entity can exist; leftmost-longest
        # entity semantics make chained str.replace unsafe (&amp;lt; -> &lt;)
        s = s.copy()
        s[amp] = s[amp].map(_html.unescape)
    out = pd.Series(index=s.index, dtype="object")
    absm = s.str.match(r"https?://").to_numpy(dtype=bool)
    out[absm] = s[absm]
    root = (s.str.startswith("/") & ~s.str.startswith("//")).to_numpy(dtype=bool)
    if root.any():
        origin = base_urls.str.extract(r"^([a-z][a-z0-9+.\-]*://[^/?#]+)", expand=False)
        out[root] = origin[root] + s[root]
    proto = s.str.startswith("//").to_numpy(dtype=bool)
    if proto.any():
        scheme = base_urls.str.extract(r"^([a-z][a-z0-9+.\-]*):", expand=False)
        out[proto] = scheme[proto] + ":" + s[proto]
    rest = out.isna().to_numpy(dtype=bool)
    if rest.any():
        out[rest] = [urljoin(b, h) for b, h in zip(base_urls[rest], s[rest])]
    return out


def extract_outlinks_frame(base_urls: pd.Series, html_texts: pd.Series) -> pd.Series:
    """Series[str html] -> Series[list[str] canonical outlink urls] in
    document order — the vectorized hot path of _fetch_parse. One
    `extractall` over the whole Arrow batch + vectorized canonicalization;
    no per-row regex/urljoin loop. Rows with no links get []."""
    empty: pd.Series = pd.Series([[] for _ in range(len(html_texts))], index=html_texts.index)
    if html_texts.empty:
        return empty
    m = html_texts.str.extractall(HREF_RE)
    if m.empty:
        return empty
    href = m[0].fillna(m[1])
    href = href[~href.str.startswith("javascript:").to_numpy(dtype=bool)]
    if href.empty:
        return empty
    rows = href.index.get_level_values(0)
    bases = base_urls.reindex(rows)
    bases.index = href.index
    canon = canonicalize_frame(bases, href)
    # vectorized regroup: extractall yields matches row-by-row, so the row
    # labels are non-decreasing in first-appearance order; np.split on the
    # bincount offsets rebuilds the per-row lists in match order. The
    # previous groupby(level=0).agg(list) ran a pure-Python per-group
    # aggregation (one Series slice + list() per row — measured 0.84s of
    # the 1.21s outlink cost on a 30k-row batch).
    import numpy as np

    pos = html_texts.index.get_indexer(rows)
    counts = np.bincount(pos, minlength=len(html_texts))
    chunks = np.split(canon.to_numpy(), np.cumsum(counts)[:-1])
    return pd.Series(
        [c.tolist() for c in chunks], index=html_texts.index
    )
