"""Deterministic synthetic GSCCCA site — the fetch-replay stand-in.

The reference crawls live pages (scrapers/lien_index_scraper.py:362-549 walks
`table.name_results` pagination; :600-756 parses detail pages). The sandbox has
no network, so fetching is replaced by pure functions of the URL: the same
(seed_id, page) always yields the same SERP html, the same detail URL always
yields the same detail html + ocr text. Both the Spark engine (inside
mapInPandas) and the pure-Python simulator call these, so correctness tests
compare *engine plumbing* (ordering, dedup, scheduling, state), not generator
noise.

No wall-clock, no `random` module: all pseudo-randomness is sha1-derived from
ids (determinism requirement, SURVEY §7 "What's hard" (a)).

Link shapes mirror the reference:
  - lien SERP links are JS-wrapped `fnSubmitThisForm('<escaped relative url>')`
    hrefs (reference: scrapers/lien_index_scraper.py:449-467)
  - realestate SERP links are plain `final.asp` hrefs
    (reference: scrapers/realestate_index_scraper.py:453-472)
  - junk links contain `maxrows` and must be filtered
    (reference: scrapers/lien_index_scraper.py:540)
  - ~5% of detail pages contain CANCELLATION and are skipped-but-marked-done
    (reference: scrapers/lien_index_scraper.py:574-578)
"""

from __future__ import annotations

import hashlib

HOT_HOST = "search.gsccca.org"
ALT_HOST = "apps.gsccca.org"  # small secondary host to exercise per-host budgets
DISALLOWED_PREFIX = "/Admin/"  # robots-gated path (north_rule robots gate)

N_DOC_UNIVERSE = 100_000  # closed universe => crawl closure is finite
COUNTY_MOD = 159  # GSCCCA has 159 county options (dashboard.html:417-...)

INSTRUMENT_CODES = [
    "1", "13", "14", "52", "2", "3", "54", "8", "9", "6", "53", "10", "7", "11", "12", "4",
]  # lien instrument vocabulary (dashboard/templates/dashboard.html:582-601)

_SURNAMES = [
    "SMITH", "JOHNSON", "WILLIAMS", "BROWN", "JONES", "DAVIS", "MILLER",
    "WILSON", "MOORE", "TAYLOR", "ANDERSON", "THOMAS", "JACKSON", "WHITE",
]
_STREETS = ["MAIN ST", "PEACHTREE RD", "OAK AVE", "MAPLE DR", "RIVER RD", "CHURCH ST"]
_CITIES = ["ATLANTA", "MACON", "SAVANNAH", "AUGUSTA", "COLUMBUS", "ALBANY"]


def h64(*parts: object) -> int:
    """Deterministic 60-bit hash of the parts (shared PRN source).
    int.from_bytes of the first 8 digest bytes >> 4 == the first 15 hex
    digits (value-identical to the former hexdigest[:15] parse, without
    the hex round-trip — this is the fetch replay's innermost hot call)."""
    key = "|".join(map(str, parts)).encode()
    return int.from_bytes(_sha1(key).digest()[:8], "big") >> 4


_sha1 = hashlib.sha1  # bind once: h64 is the replay's innermost hot call


def n_serp_pages(seed_id: int) -> int:
    return 1 + h64("npages", seed_id) % 3  # 1..3 pages per seed


def n_serp_links(seed_id: int, page: int) -> int:
    return 5 + h64("nlinks", seed_id, page) % 6  # 5..10 links per page


def _doc_no(seed_id: int, page: int, link: int) -> int:
    """Doc number behind a SERP link. ~20% of links draw from a tiny hot set
    shared across all seeds/pages, guaranteeing cross-page and cross-seed
    duplicates (dedup target, reference: realestate_index_scraper.py:474,510)."""
    r = h64("doc", seed_id, page, link)
    if r % 5 == 0:
        return r % 500
    return r % N_DOC_UNIVERSE


def doc_url(doc_no: int) -> str:
    """Canonical detail-page URL for a doc number."""
    county = doc_no % COUNTY_MOD + 1
    host = ALT_HOST if doc_no % 23 == 0 else HOT_HOST
    book = doc_no // 1000 + 1
    page = doc_no % 997 + 1
    return (
        f"https://{host}/Lien/liendetails.asp?county={county}"
        f"&book={book}&page={page}&id={doc_no}"
    )


def _raw_href(doc_no: int, escaped: bool) -> str:
    """Relative href as it appears in SERP html (pre-canonicalization)."""
    county = doc_no % COUNTY_MOD + 1
    book = doc_no // 1000 + 1
    page = doc_no % 997 + 1
    amp = "&amp;" if escaped else "&"
    host = ALT_HOST if doc_no % 23 == 0 else HOT_HOST
    # absolute-path reference resolved against the SERP base url; alt-host
    # links are absolute (cross-host discovery)
    if host == ALT_HOST:
        return (
            f"https://{ALT_HOST}/Lien/liendetails.asp?county={county}"
            f"{amp}book={book}{amp}page={page}{amp}id={doc_no}"
        )
    return f"/Lien/liendetails.asp?county={county}{amp}book={book}{amp}page={page}{amp}id={doc_no}"


def serp_base_url(seed_id: int, page: int) -> str:
    return f"https://{HOT_HOST}/Lien/namesearchresults.asp?seed={seed_id}&pg={page}"


def serp_html(seed_id: int, page: int) -> str:
    """Synthetic search-results page: a name_results table whose anchor set
    mirrors the reference's extraction target
    (scrapers/lien_index_scraper.py:449-452 collects
    a[href^="javascript:fnSubmitThisForm("])."""
    rows = []
    nlinks = n_serp_links(seed_id, page)
    for i in range(nlinks):
        dn = _doc_no(seed_id, page, i)
        r = h64("style", seed_id, page, i)
        escaped = r % 3 == 0
        href = _raw_href(dn, escaped)
        if r % 7 == 0:
            # plain final.asp-style link (realestate form)
            rows.append(f'<tr><td><a href="{href}">doc {dn}</a></td></tr>')
        else:
            # lien form: JS-wrapped
            rows.append(
                f'<tr><td><a href="javascript:fnSubmitThisForm(\'{href}\');">doc {dn}</a></td></tr>'
            )
        if r % 11 == 0:
            # junk pagination link containing maxrows (filter target)
            rows.append(
                f'<tr><td><a href="/Lien/namesearch.asp?MaxRows=50&seed={seed_id}">resize</a></td></tr>'
            )
        if r % 13 == 0:
            # robots-disallowed admin link (gate target; reference has no
            # robots handling — engine adds it per north_rule)
            rows.append(
                f'<tr><td><a href="javascript:fnSubmitThisForm(\'/Admin/audit.asp?id={dn}\');">admin</a></td></tr>'
            )
    body = "\n".join(rows)
    return (
        f"<html><body><table class='name_results'>"
        f"<tr><th>Name</th></tr>\n{body}\n</table></body></html>"
    )


def _money(doc_no: int) -> str:
    r = h64("amt", doc_no)
    dollars = 50 + r % 250_000
    cents = (r >> 20) % 100
    return f"{dollars:,}.{cents:02d}"


def is_cancelled(doc_no: int) -> bool:
    return h64("cancel", doc_no) % 20 == 0  # ~5%


def has_related_links(doc_no: int) -> bool:
    return h64("rel?", doc_no) % 3 == 0  # ~1/3 of docs link onward (depth>1)


def related_doc_nos(doc_no: int) -> list[int]:
    if not has_related_links(doc_no):
        return []
    n = 1 + h64("nrel", doc_no) % 3
    return [h64("rel", doc_no, j) % N_DOC_UNIVERSE for j in range(n)]


def media_ref(doc_no: int) -> str:
    """Content hash standing in for the canvas-screenshot PDF
    (reference: scrapers/lien_index_scraper.py:687-711)."""
    return "sha1:" + hashlib.sha1(f"pdfbytes|{doc_no}".encode()).hexdigest()


def detail_html(url: str) -> str:
    """Synthetic detail page keyed by canonical URL. Embeds the structures
    the reference parses: 6-col doc table (lien_index_scraper.py:614-627),
    Description with $ amount (:629-634), party tables (:636-646), inline
    viewer JS vars (:649-659)."""
    return detail_html_no(int(url.rsplit("id=", 1)[1]))


def detail_html_no(doc_no: int, _amount: str | None = None) -> str:
    """detail_html keyed by the already-parsed doc number — the fetch
    replay parses doc_no from the url once per batch and reuses it for
    html/ocr/media_ref instead of three per-row rsplits. `_amount` lets
    detail_page_no share the one _money(doc_no) both page bodies embed."""
    county = doc_no % COUNTY_MOD + 1
    book = doc_no // 1000 + 1
    page = doc_no % 997 + 1
    r = h64("detail", doc_no)
    instrument = INSTRUMENT_CODES[r % len(INSTRUMENT_CODES)]
    month = 1 + (r >> 4) % 12
    day = 1 + (r >> 9) % 28
    year = 2015 + (r >> 14) % 10
    debtor = _SURNAMES[r % len(_SURNAMES)] + ", " + _SURNAMES[(r >> 5) % len(_SURNAMES)][:1]
    claimant = _SURNAMES[(r >> 10) % len(_SURNAMES)] + " COUNTY TAX COMMISSIONER"
    amount = _money(doc_no) if _amount is None else _amount
    cancelled = "<div>CANCELLATION</div>" if is_cancelled(doc_no) else ""
    rel_rows = "".join(
        f'<a href="javascript:fnSubmitThisForm(\'{_raw_href(rn, rn % 2 == 0)}\');">related {rn}</a>'
        for rn in related_doc_nos(doc_no)
    )
    return f"""<html><body>{cancelled}
<table class="doc_info"><tr><th>County</th><th>Instrument</th><th>Date Filed</th><th>Time</th><th>Book</th><th>Page</th></tr>
<tr><td>COUNTY {county}</td><td>{instrument}</td><td>{month:02d}/{day:02d}/{year}</td><td>09:0{r % 10}</td><td>{book}</td><td>{page}</td></tr></table>
<div class="description">State Tax Execution in the amount of ${amount} Description line {doc_no}</div>
<table class="party direct"><tr><td>{debtor}</td></tr></table>
<table class="party reverse"><tr><td>{claimant}</td></tr></table>
<div class="related">{rel_rows}</div>
<script>var iLienID = {doc_no}; var county = "{county}"; var book = "{book}"; var page = "{page}"; var user = 7; var appid = 4;</script>
</body></html>"""


# ------------------------------------------------ real-estate entity pages
# The RE pipeline selects one rdoEntityName radio at a time and pulls the
# entity's final.asp document links (realestate_index_scraper.py:423-484).

RE_BASE = f"https://{HOT_HOST}/RealEstate/"


def n_re_entities(search_name: str) -> int:
    """Number of rdoEntityName radios a search returns (1..5)."""
    return 1 + h64("re_entities", search_name) % 5


def re_entity_doc_nos(search_name: str, entity_idx: int) -> list[int]:
    """Doc numbers behind one entity's final.asp links (with deliberate
    in-page duplicates — the reference dedups per entity with an ordered
    dict, realestate_index_scraper.py:476)."""
    n = 3 + h64("re_ndocs", search_name, entity_idx) % 6
    nos = [h64("re_doc", search_name, entity_idx, j) % N_DOC_UNIVERSE for j in range(n)]
    if n >= 4:
        nos.append(nos[0])  # duplicate link target on the same page
    return nos


def re_entity_html(search_name: str, entity_idx: int) -> str:
    """Entity detail page: final.asp anchors, both plain and JS-wrapped
    (realestate_index_scraper.py:453-472)."""
    rows = []
    for j, dn in enumerate(re_entity_doc_nos(search_name, entity_idx)):
        r = h64("re_style", search_name, entity_idx, j)
        amp = "&amp;" if r % 3 == 0 else "&"
        rel = f"final.asp?entity={entity_idx}{amp}doc={dn}"
        if r % 2 == 0:
            rows.append(f'<a href="javascript:fnSubmitThisForm(\'{rel}\');">GE {dn}</a>')
        else:
            rows.append(f'<a href="{rel}">GR {dn}</a>')
    return "<html><body>" + "\n".join(rows) + "</body></html>"


def detail_ocr_text(url: str) -> str:
    """Synthetic OCR body with the cue lines the reference's extractors key on
    (ocr/ocr_tax_extractor.py:43-56,451-462; ocr/realestate_ocr_extractor.py:23-66),
    including the §->$ OCR-noise case (ocr_tax_extractor.py:470-471)."""
    return detail_ocr_no(int(url.rsplit("id=", 1)[1]))


def detail_page_no(doc_no: int) -> tuple[str, str]:
    """(detail html, ocr text) in one call, sharing the _money(doc_no)
    both bodies embed — the fetch replay's per-row kernel."""
    amount = _money(doc_no)
    return detail_html_no(doc_no, amount), detail_ocr_no(doc_no, amount)


def detail_ocr_no(doc_no: int, _amount: str | None = None) -> str:
    """detail_ocr_text keyed by the already-parsed doc number."""
    r = h64("ocr", doc_no)
    amount = _money(doc_no) if _amount is None else _amount
    lesser = _money(doc_no + 1)
    street_no = 100 + r % 9899
    street = _STREETS[r % len(_STREETS)]
    city = _CITIES[(r >> 6) % len(_CITIES)]
    zipc = 30000 + r % 1999
    dollar = "§" if r % 9 == 0 else "$"  # OCR noise fixup target
    return (
        f"STATE OF GEORGIA TAX FIFA\n"
        f"DEFENDANT IN FIFA: {_SURNAMES[r % len(_SURNAMES)]}\n"
        f"{street_no} {street}\n{city}, GA {zipc}\n"
        f"INTEREST {dollar}{lesser}\n"
        f"TOTAL DUE: {dollar}{amount}\n"
        f"DESCRIPTION: all that tract of land lot {doc_no % 500} district {r % 20}\n"
    )
