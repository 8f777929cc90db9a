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
# viewer JS variables (lien_index_scraper.py:649-659). The reference pages
# QUOTE county/book/page (var county = "123", lien_index_scraper.py:655-657)
# while iLienID/user/appid are bare ints — the optional quote accepts both
# markups (r3 ADVICE #4)
VIEWER_VAR_RES = {
    name: re.compile(rf'var {name}\s*=\s*"?(\d+)"?')
    for name in ("iLienID", "county", "book", "page", "user", "appid")
}
# one-pass fast path for the vectorized parser: the reference pages declare
# the six vars consecutively in this order (lien_index_scraper.py:649-659),
# so a single ordered-chain regex replaces six whole-page scans. Rows the
# chain does NOT match (missing var, permuted page) fall back to the exact
# per-var extraction, so any page outside the well-formed domain parses
# identically to before.
VIEWER_VARS_CHAIN_RE = re.compile(
    "".join(
        rf'var {name}\s*=\s*"?(\d+)"?' + (r"[\s\S]*?" if i < 5 else "")
        for i, name in enumerate(VIEWER_VAR_RES)
    )
)
# viewer-URL synthesis (F2): the reference assembles the HTML5Viewer URL
# from the 6 extracted JS vars and stores it as pdf_document_url
# (lien_index_scraper.py:661-665); the dashboard export equi-looks-up records
# by this URL (dashboard/views.py:122)
VIEWER_URL_PREFIX = "https://search.gsccca.org/Imaging/HTML5Viewer.aspx?"


def viewer_url(v: dict) -> str:
    """pdf_document_url from the extracted JS vars; '' when any var is
    missing (the reference sets pdf_document_url only inside the
    all-vars-matched branch, lien_index_scraper.py:651-665)."""
    keys = ("iLienID", "book", "page", "county", "user", "appid")
    if any(not v.get(k) for k in keys):
        return ""
    return (
        f"{VIEWER_URL_PREFIX}id={v['iLienID']}&key1={v['book']}&key2={v['page']}"
        f"&county={v['county']}&userid={v['user']}&appid={v['appid']}"
    )


def viewer_url_col(ilienid, book, page, county, user, appid):
    """JVM-side viewer-URL synthesis — concat under whole-stage codegen;
    '' when any var is empty/NULL (mirrors `viewer_url`)."""
    F = _fcol()
    cols = [ilienid, book, page, county, user, appid]
    missing = None
    for c in cols:
        m = F.coalesce(c.cast("string"), F.lit("")) == ""
        missing = m if missing is None else (missing | m)
    return F.when(missing, F.lit("")).otherwise(
        F.concat(
            F.lit(VIEWER_URL_PREFIX + "id="), ilienid.cast("string"),
            F.lit("&key1="), book.cast("string"),
            F.lit("&key2="), page.cast("string"),
            F.lit("&county="), county.cast("string"),
            F.lit("&userid="), user.cast("string"),
            F.lit("&appid="), appid.cast("string"),
        )
    )


# doc-info table row (detail page structure, lien_index_scraper.py:614-627)
DOC_ROW_RE = re.compile(
    r"<tr><td>(COUNTY \d+)</td><td>([^<]*)</td><td>([^<]*)</td><td>[^<]*</td>"
    r"<td>([^<]*)</td><td>([^<]*)</td></tr>"
)
DESCRIPTION_RE = re.compile(r'<div class="description">([^<]*)</div>')
PARTY_DIRECT_RE = re.compile(r'<table class="party direct"><tr><td>([^<]*)</td></tr></table>')
PARTY_REVERSE_RE = re.compile(r'<table class="party reverse"><tr><td>([^<]*)</td></tr></table>')
TOTAL_DUE_RE = re.compile(r"TOTAL DUE:\s*[$§]?\s*([\d,]+(?:\.\d{1,2})?)")

# keyword weights for money-candidate scoring — verbatim copy of the
# reference importance_keywords table (ocr/ocr_tax_extractor.py:451-462)
SCORE_KEYWORDS: list[tuple[str, float]] = [
    ("TOTAL DUE", 12.0),
    ("TOTAL LIEN", 10.0),
    ("TOTAL AMOUNT", 10.0),
    ("TOTAL", 10.0),
    ("BALANCE DUE", 10.0),
    ("BALANCE", 6.0),
    ("PAID AMOUNT", 8.0),
    ("PAID", 4.0),
    ("DUE", 4.0),
    ("TAX", 2.0),
]
# money-with-$ / bare-decimal (ocr_tax_extractor.py:43,49)
DOLLAR_MONEY_RE = re.compile(r"\$\s*[\d,]+(?:\.\d{1,2})?")
DECIMAL_RE = re.compile(r"[\d,]+\.\d{2}")


def normalize_spaces(s: str) -> str:
    """Collapse runs of spaces/tabs (realestate_ocr_extractor.py:137-138)."""
    return re.sub(r"[ \t]+", " ", s or "").strip()


def normalize_money(raw: str) -> float | None:
    """Strip $/, and cast (lien_index_scraper.py:100-111). Returns None on junk."""
    try:
        return float(raw.replace("$", "").replace(",", "").strip())
    except (ValueError, AttributeError):
        return None


def fix_ocr_noise(text: str) -> str:
    """`§`->`$`, word-initial `S` (optional space) before a digit -> `$`
    OCR fixups (ocr_tax_extractor.py:470-471)."""
    return re.sub(r"\bS\s*(?=\d)", "$", text.replace("§", "$"))


def score_money_candidates(ocr_text: str) -> list[tuple[float, str]]:
    """Score each `$`-money candidate by the keyword weights of its line plus
    a value/1000 bias; when no `$`-amount >= 100 exists, recover bare decimals
    from TOTAL lines with a +5.0 boost (the fallback path). Returns
    (score, raw) sorted by (-score, raw); top-3 is taken by the caller (O3).
    Mirrors extract_amounts (ocr_tax_extractor.py:436-555) line-for-line,
    except ties sort by raw (deterministic) instead of insertion order."""
    out: list[tuple[float, str]] = []
    has_big_dollar = False
    for line in (ocr_text or "").splitlines():
        raw_line = line.strip()
        if not raw_line:
            continue
        upper = raw_line.upper()
        norm_line = fix_ocr_noise(raw_line)
        for m in DOLLAR_MONEY_RE.finditer(norm_line):
            raw = m.group().replace(" ", "")
            val = normalize_money(raw)
            score = sum(w for kw, w in SCORE_KEYWORDS if kw in upper)
            if val is not None:
                score += val / 1000.0
                if raw.startswith("$") and val >= 100.0:
                    has_big_dollar = True
            out.append((round(score, 3), raw))
    # fallback: TOTAL-without-$ recovery (ocr_tax_extractor.py:500-544)
    if not has_big_dollar:
        for line in (ocr_text or "").splitlines():
            raw_line = line.strip()
            if not raw_line:
                continue
            upper = raw_line.upper()
            if "TOTAL" not in upper:
                continue
            nums = [
                (v, m.group(0))
                for m in DECIMAL_RE.finditer(raw_line)
                if (v := normalize_money(m.group(0))) is not None
            ]
            if not nums:
                continue
            val, raw = max(nums, key=lambda t: t[0])
            score = sum(w for kw, w in SCORE_KEYWORDS if kw in upper)
            score += 5.0  # boost for TOTAL-without-$ recovery
            score += val / 1000.0
            out.append((round(score, 3), raw))
    out.sort(key=lambda t: (-t[0], t[1]))
    return out


# --------------------------------------------------- date/name cascades (F5/F6)
# Pattern vocabulary mirrors ocr/realestate_ocr_extractor.py:23-66 verbatim
# (required semantic parity). Every pattern is RE2-compatible (no lookaround)
# so the same regex strings drive the Java-regex Column versions below AND the
# DuckDB oracle SQL in __spark_entry__.py.

MONTH_DATE_PAT = (
    r"\b(Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|"
    r"Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\s+"
    r"(\d{1,2})(?:st|nd|rd|th)?\s*,\s*(\d{4})\b"
)
NUMERIC_DATE_PAT = r"\b(\d{1,2})[/-](\d{1,2})[/-](\d{2,4})\b"
FILED_RECORDED_PAT = (
    r"(Filed\s+and\s+Recorded|Filed\s*&\s*Recorded)\s+(.{0,60}?\b\d{4}\b)"
)
MORTGAGE_DATE_PATS = [
    r"\bmade\s+this\s+(.{0,40}?\b\d{4}\b)",
    r"\bdated\s+(.{0,40}?\b\d{4}\b)",
    r"\beffective\s+the\s+(.{0,40}?\b\d{4}\b)",
]
NAME_PATS = [
    r"\bBorrower(?:s)?\b\s*[:\-]?\s*(.+)",
    r"\bmade\s+this\s+.+?\b,\s*(.+?)\s*\(\s*\"?Borrower",
    r"\b(.*?)\s*\(\s*\"?Borrower",
]
LENDER_PATS = [
    r"\b(?:Lender|Mortgagee)\b\s*[:\-]?\s*(.+)",
    # trailing \b is part of the reference pattern (realestate_ocr_extractor
    # .py:44): "in favor of X, <space>..." does NOT match (no word boundary
    # after the comma) and falls through the cascade
    r"\bin\s+favor\s+of\s+(.+?)(?:,|\.)\b",
    r"\bto\s+(.+?)\s*\(\s*\"?Lender\"?\s*\)",
]
_MONTH_DATE_RE = re.compile(MONTH_DATE_PAT, re.I)
_NUMERIC_DATE_RE = re.compile(NUMERIC_DATE_PAT)
_FILED_RECORDED_RE = re.compile(FILED_RECORDED_PAT, re.I)
_MORTGAGE_DATE_RES = [re.compile(p, re.I) for p in MORTGAGE_DATE_PATS]
_NAME_RES = [re.compile(p, re.I) for p in NAME_PATS]
_LENDER_RES = [re.compile(p, re.I) for p in LENDER_PATS]
_NAME_CLEAN_RE = re.compile(r'["\(\)\n\r]')
_LENDER_CLEAN_RE = re.compile(r"[\n\r\.]")


def find_first_date(text: str) -> str:
    """Month-name date first, numeric date second
    (realestate_ocr_extractor.py:154-162)."""
    t = text or ""
    m = _MONTH_DATE_RE.search(t)
    if m:
        return normalize_spaces(m.group(0))
    m = _NUMERIC_DATE_RE.search(t)
    if m:
        return normalize_spaces(m.group(0))
    return ""


def extract_assignment_date(header_text: str) -> str:
    """'Filed and Recorded <fragment>' date, falling back to the fragment
    itself, then to the first date anywhere (realestate_ocr_extractor.py:
    164-173)."""
    if not header_text:
        return ""
    m = _FILED_RECORDED_RE.search(header_text)
    if m:
        frag = m.group(0)
        return find_first_date(frag) or normalize_spaces(frag)
    return find_first_date(header_text)


def extract_mortgage_date(body_text: str) -> str:
    """made this / dated / effective-the cue cascade with first-date fallback
    (realestate_ocr_extractor.py:175-185)."""
    if not body_text:
        return ""
    for rx in _MORTGAGE_DATE_RES:
        m = rx.search(body_text)
        if m:
            cand = m.group(1)
            return find_first_date(cand) or normalize_spaces(cand)
    return find_first_date(body_text)


def extract_name(body_text: str) -> str:
    """Borrower-name priority cascade + cleanup split + [:120] truncation
    (realestate_ocr_extractor.py:187-199)."""
    t = body_text or ""
    for rx in _NAME_RES:
        m = rx.search(t)
        if m:
            name = _NAME_CLEAN_RE.split(m.group(1))[0]
            return normalize_spaces(name)[:120]
    m = re.search(r"\bBorrower(?:s)?\b.{0,60}", t, re.I)
    if m:
        return normalize_spaces(m.group(0))[:120]
    return ""


def extract_lender(body_text: str) -> str:
    """Lender priority cascade + cleanup split + [:140] truncation
    (realestate_ocr_extractor.py:201-213)."""
    t = body_text or ""
    for rx in _LENDER_RES:
        m = rx.search(t)
        if m:
            lender = _LENDER_CLEAN_RE.split(m.group(1))[0]
            return normalize_spaces(lender)[:140]
    m = re.search(r"([A-Z][A-Za-z0-9&\-,\. ]{3,120})\s*\(\s*Lender\s*\)", t, re.I)
    if m:
        return normalize_spaces(m.group(1))[:140]
    return ""


# -------------------------------------------- cascade Column versions (JVM side)
# The same pattern strings as Catalyst expressions: coalesce over a priority
# list of regexp_extract, whole-stage-codegen'd — no Python in the hot path.

def _fcol():
    from pyspark.sql import functions as F  # local import: pandas-only callers

    return F


def _norm_spaces_col(c):
    F = _fcol()
    return F.trim(F.regexp_replace(c, r"[ \t]+", " "))


def _first_nonempty(*cols):
    F = _fcol()
    return F.coalesce(*[F.nullif(c, F.lit("")) for c in cols], F.lit(""))


def first_date_col(text):
    """find_first_date as a Column (month-name priority, numeric fallback)."""
    F = _fcol()
    return _first_nonempty(
        _norm_spaces_col(F.regexp_extract(text, f"(?i){MONTH_DATE_PAT}", 0)),
        _norm_spaces_col(F.regexp_extract(text, NUMERIC_DATE_PAT, 0)),
    )


def assignment_date_col(text):
    """extract_assignment_date as a Column."""
    F = _fcol()
    frag = F.regexp_extract(text, f"(?i){FILED_RECORDED_PAT}", 0)
    return F.when(
        frag != "", _first_nonempty(first_date_col(frag), _norm_spaces_col(frag))
    ).otherwise(first_date_col(text))


def mortgage_date_col(text):
    """extract_mortgage_date as a Column: one WHEN branch per cue pattern in
    priority order, first-date fallback."""
    F = _fcol()
    c0 = F.regexp_extract(text, f"(?i){MORTGAGE_DATE_PATS[0]}", 1)
    c1 = F.regexp_extract(text, f"(?i){MORTGAGE_DATE_PATS[1]}", 1)
    c2 = F.regexp_extract(text, f"(?i){MORTGAGE_DATE_PATS[2]}", 1)
    return (
        F.when(c0 != "", _first_nonempty(first_date_col(c0), _norm_spaces_col(c0)))
        .when(c1 != "", _first_nonempty(first_date_col(c1), _norm_spaces_col(c1)))
        .when(c2 != "", _first_nonempty(first_date_col(c2), _norm_spaces_col(c2)))
        .otherwise(first_date_col(text))
    )


def _priority_pick_col(text, pats, clean, fb_pat, fb_group, width):
    """Reference cascade semantics as a Column: the FIRST pattern that MATCHES
    wins, even when its cleaned capture is empty (the reference returns the
    cleaned-possibly-empty string and stops). Match is tested with rlike, so
    no-match and matched-but-empty are distinguished."""
    F = _fcol()
    out = None
    for p in pats:
        pat = f"(?i){p}"
        branch = clean(F.regexp_extract(text, pat, 1))
        cond = text.rlike(pat)
        out = F.when(cond, branch) if out is None else out.when(cond, branch)
    fallback = F.substring(
        _norm_spaces_col(F.regexp_extract(text, fb_pat, fb_group)), 1, width
    )
    return out.otherwise(fallback)


def name_col(text):
    """extract_name as a Column: priority regexes, cleanup split (take the
    prefix before any of ["()\\n\\r]), truncate to 120."""
    F = _fcol()

    def clean(c):
        return F.substring(
            _norm_spaces_col(F.regexp_extract(c, r'^([^"\(\)\n\r]*)', 1)), 1, 120
        )

    return _priority_pick_col(
        text, NAME_PATS, clean, r"(?i)\bBorrower(?:s)?\b.{0,60}", 0, 120
    )


def lender_col(text):
    """extract_lender as a Column (cleanup split on [\\n\\r.], truncate 140)."""
    F = _fcol()

    def clean(c):
        return F.substring(
            _norm_spaces_col(F.regexp_extract(c, r"^([^\n\r\.]*)", 1)), 1, 140
        )

    return _priority_pick_col(
        text, LENDER_PATS, clean,
        r"(?i)([A-Z][A-Za-z0-9&\-,\. ]{3,120})\s*\(\s*Lender\s*\)", 1, 140,
    )


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
    # F2 tail: synthesize the HTML5Viewer pdf_document_url from the vars
    # (lien_index_scraper.py:661-665)
    rec["pdf_document_url"] = viewer_url(viewer)
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
    # F2: viewer vars -> pdf_document_url. One ordered-chain extract over
    # the batch (VIEWER_VARS_CHAIN_RE) with exact per-var fallback for the
    # rows the chain missed; '' when any var missed
    fast = html_s.str.extract(VIEWER_VARS_CHAIN_RE)
    fast.columns = list(VIEWER_VAR_RES)
    chain_miss = fast["iLienID"].isna()
    if bool(chain_miss.any()):
        sub = html_s[chain_miss]
        for name, rx in VIEWER_VAR_RES.items():
            fast.loc[chain_miss, name] = sub.str.extract(rx, expand=False)
    vv = {name: fast[name].fillna("") for name in VIEWER_VAR_RES}
    all_present = None
    for s in vv.values():
        ok = s != ""
        all_present = ok if all_present is None else (all_present & ok)
    synth = (
        VIEWER_URL_PREFIX + "id=" + vv["iLienID"] + "&key1=" + vv["book"]
        + "&key2=" + vv["page"] + "&county=" + vv["county"]
        + "&userid=" + vv["user"] + "&appid=" + vv["appid"]
    )
    out["pdf_document_url"] = synth.where(all_present, "")
    # blank out fields of cancelled docs (parse skipped in reference)
    cancelled = out["cancelled"]
    if bool(cancelled.any()):
        for c in ("county", "instrument", "date_filed", "book", "page_no",
                  "description", "amount", "debtors", "claimants", "pdf_document_url"):
            out.loc[cancelled, c] = ""
        out.loc[cancelled, "amount_value"] = None
    addr = ocr_s.str.extract(ADDRESS_LINE_RE, expand=False).fillna("")
    csz = ocr_s.str.extract(CITY_STATE_ZIP_RE)
    has_csz = csz[0].notna()
    full = addr + " | " + csz[0].fillna("") + ", " + csz[1].fillna("") + " " + csz[2].fillna("")
    out["address"] = addr.where(~(has_csz & (addr != "")), full)
    out.loc[cancelled, "address"] = ""
    return out
