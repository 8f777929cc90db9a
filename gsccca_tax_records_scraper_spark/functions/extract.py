"""Field extraction from detail pages + OCR bodies (SURVEY §2.8 F2-F7, P3-P5).

Regex vocabulary mirrors the reference:
  - AMOUNT_PATTERN strips $/, from money (lien_index_scraper.py:50-52,100-111)
  - MONEY_RE + OCR fixups `§`->`$`, `S<digit>`->`$` (ocr/ocr_tax_extractor.py:43,464-498)
  - GA zip patterns (lien_index_scraper.py:787-788; ocr_tax_extractor.py:44-56)
  - skip words CANCELLATION/... (realestate_index_scraper.py:148-152;
    ocr/realestate_ocr_extractor.py:21,345-350)
  - viewer JS vars iLienID/county/book/page/user/appid (lien_index_scraper.py:649-659)
  - TOTAL-DUE keyword scoring weights (ocr/ocr_tax_extractor.py:451-462,482-489)

Two implementations of each extractor:
  - `parse_detail(...)` — plain Python on one document (simulator / oracle path)
  - `parse_detail_frame(...)` — vectorized pandas .str ops over an Arrow batch
    (engine path, called from mapInPandas)
The tests assert the two agree span-for-span (per-row invariant in
BASELINE.json input_hint).
"""

from __future__ import annotations

import re

import pandas as pd

# money with optional $ and thousands commas (lien_index_scraper.py:50-52)
MONEY_RE = re.compile(r"[$§]\s*([\d,]+(?:\.\d{1,2})?)")
AMOUNT_IN_TEXT_RE = re.compile(r"in the amount of \$([\d,]+(?:\.\d{1,2})?)")
# state-zip (ocr/ocr_tax_extractor.py:44-56; US_STATE_ABBRS=["GA","FL"])
ZIP_RE = re.compile(r"\b(?:GA|FL)\s+(\d{5})(?:-\d{4})?\b")
ADDRESS_LINE_RE = re.compile(r"^(\d{1,5}\s+[A-Z][A-Z ]+)$", re.M)
CITY_STATE_ZIP_RE = re.compile(r"^([A-Z ]+),\s+(GA|FL)\s+(\d{5})$", re.M)
# skip words (realestate_index_scraper.py:148-152)
SKIP_WORDS_RE = re.compile(r"CANCELLATION|CANCELLED|FORECLOSURE|FORECLOSED")
# viewer JS variables (lien_index_scraper.py:649-659)
VIEWER_VAR_RES = {
    name: re.compile(rf"var {name}\s*=\s*(\d+)")
    for name in ("iLienID", "county", "book", "page", "user", "appid")
}
# doc-info table row (detail page structure, lien_index_scraper.py:614-627)
DOC_ROW_RE = re.compile(
    r"<tr><td>(COUNTY \d+)</td><td>([^<]*)</td><td>([^<]*)</td><td>[^<]*</td>"
    r"<td>([^<]*)</td><td>([^<]*)</td></tr>"
)
DESCRIPTION_RE = re.compile(r'<div class="description">([^<]*)</div>')
PARTY_DIRECT_RE = re.compile(r'<table class="party direct"><tr><td>([^<]*)</td></tr></table>')
PARTY_REVERSE_RE = re.compile(r'<table class="party reverse"><tr><td>([^<]*)</td></tr></table>')
TOTAL_DUE_RE = re.compile(r"TOTAL DUE:\s*[$§]?\s*([\d,]+(?:\.\d{1,2})?)")

# keyword weights for money-candidate scoring (ocr/ocr_tax_extractor.py:451-462)
SCORE_KEYWORDS: list[tuple[str, float]] = [
    ("TOTAL DUE", 12.0),
    ("TOTAL", 8.0),
    ("BALANCE", 6.0),
    ("AMOUNT DUE", 6.0),
    ("DUE", 4.0),
    ("INTEREST", 3.0),
    ("TAX", 2.0),
]


def normalize_money(raw: str) -> float | None:
    """Strip $/, and cast (lien_index_scraper.py:100-111). Returns None on junk."""
    try:
        return float(raw.replace("$", "").replace(",", "").strip())
    except (ValueError, AttributeError):
        return None


def fix_ocr_noise(text: str) -> str:
    """`§`->`$`, `S<digit>`->`$<digit>` OCR fixups (ocr_tax_extractor.py:470-471)."""
    return re.sub(r"S(?=\d)", "$", text.replace("§", "$"))


def score_money_candidates(ocr_text: str) -> list[tuple[float, str]]:
    """Score each money candidate by the keyword weights of its line plus a
    value/1000 bias; return (score, raw) sorted desc (ocr_tax_extractor.py:
    436-555). Top-3 is taken by the caller (O3)."""
    fixed = fix_ocr_noise(ocr_text)
    out: list[tuple[float, str]] = []
    for line in fixed.splitlines():
        upper = line.upper()
        for m in MONEY_RE.finditer(line):
            val = normalize_money(m.group(1))
            if val is None:
                continue
            score = sum(w for kw, w in SCORE_KEYWORDS if kw in upper)
            score += val / 1000.0
            out.append((score, m.group(1)))
    out.sort(key=lambda t: (-t[0], t[1]))
    return out


# ------------------------------------------------------------- single-doc path

def parse_detail(url: str, html_text: str, ocr_text: str) -> dict:
    """Plain-Python parse of one detail page into a record dict — mirrors
    parse_lien_data (lien_index_scraper.py:600-753). Simulator/oracle path."""
    cancelled = bool(SKIP_WORDS_RE.search(html_text))
    rec: dict = {"url": url, "cancelled": cancelled}
    if cancelled:
        # cancellation filter: skip parsing, still mark done
        # (lien_index_scraper.py:574-578)
        return rec
    m = DOC_ROW_RE.search(html_text)
    rec["county"], rec["instrument"], rec["date_filed"], rec["book"], rec["page_no"] = (
        m.groups() if m else ("", "", "", "", "")
    )
    d = DESCRIPTION_RE.search(html_text)
    rec["description"] = d.group(1).strip() if d else ""
    am = AMOUNT_IN_TEXT_RE.search(rec["description"])
    rec["amount"] = am.group(1) if am else ""
    rec["amount_value"] = normalize_money(rec["amount"]) if am else None
    pd_ = PARTY_DIRECT_RE.search(html_text)
    pr = PARTY_REVERSE_RE.search(html_text)
    rec["debtors"] = pd_.group(1) if pd_ else ""
    rec["claimants"] = pr.group(1) if pr else ""
    viewer = {k: (rx.search(html_text) or [None, ""])[1] for k, rx in VIEWER_VAR_RES.items()}
    rec["viewer"] = viewer
    # OCR-derived fields
    fixed = fix_ocr_noise(ocr_text)
    td = TOTAL_DUE_RE.search(fixed)
    if td:
        rec["total_due"] = td.group(1)
    addr = ADDRESS_LINE_RE.search(ocr_text)
    csz = CITY_STATE_ZIP_RE.search(ocr_text)
    rec["address"] = (
        f"{addr.group(1)} | {csz.group(1)}, {csz.group(2)} {csz.group(3)}"
        if addr and csz
        else (addr.group(1) if addr else "")
    )
    return rec


def record_spans(rec: dict, ocr_text: str, media: str) -> list[tuple[str, str, str, int]]:
    """Interleaved span sequence (kind, text, media_ref, offset) for a parsed
    record — the authoritative output shape (BASELINE.json input_hint)."""
    if rec.get("cancelled"):
        return []
    header = "|".join(
        [rec["county"], rec["instrument"], rec["date_filed"], rec["book"], rec["page_no"]]
    )
    parties = f"{rec['debtors']}; {rec['claimants']}"
    return [
        ("text", header, "", 0),
        ("text", rec["description"], "", 1),
        ("text", parties, "", 2),
        ("media", "", media, 3),
        ("text", ocr_text, "", 4),
    ]


# ------------------------------------------------------------ vectorized path

def parse_detail_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized parse of an Arrow batch with columns (url, html, ocr_text).
    Engine path: pandas .str ops only, no per-row Python except the regulated
    span assembly. Returns the RECORD columns + a `spans` object column."""
    html_s = pdf["html"]
    ocr_s = pdf["ocr_text"]
    out = pd.DataFrame(index=pdf.index)
    out["url"] = pdf["url"]
    out["cancelled"] = html_s.str.contains(SKIP_WORDS_RE)
    doc = html_s.str.extract(DOC_ROW_RE)
    doc.columns = ["county", "instrument", "date_filed", "book", "page_no"]
    for c in doc.columns:
        out[c] = doc[c].fillna("")
    out["description"] = html_s.str.extract(DESCRIPTION_RE, expand=False).fillna("").str.strip()
    out["amount"] = out["description"].str.extract(AMOUNT_IN_TEXT_RE, expand=False).fillna("")
    out["amount_value"] = (
        out["amount"].str.replace(",", "", regex=False).replace("", None).astype("float64")
    )
    out["debtors"] = html_s.str.extract(PARTY_DIRECT_RE, expand=False).fillna("")
    out["claimants"] = html_s.str.extract(PARTY_REVERSE_RE, expand=False).fillna("")
    # blank out fields of cancelled docs (parse skipped in reference)
    cancelled = out["cancelled"]
    for c in ("county", "instrument", "date_filed", "book", "page_no",
              "description", "amount", "debtors", "claimants"):
        out.loc[cancelled, c] = ""
    out.loc[cancelled, "amount_value"] = None
    addr = ocr_s.str.extract(ADDRESS_LINE_RE, expand=False).fillna("")
    csz = ocr_s.str.extract(CITY_STATE_ZIP_RE)
    has_csz = csz[0].notna()
    full = addr + " | " + csz[0].fillna("") + ", " + csz[1].fillna("") + " " + csz[2].fillna("")
    out["address"] = addr.where(~(has_csz & (addr != "")), full)
    out.loc[cancelled, "address"] = ""
    return out
