"""F5/F6 extraction-cascade parity tests (VERDICT r1 items 4-6).

The plain-Python cascade functions mirror ocr/realestate_ocr_extractor.py:
154-229 (date priority, Filed-and-Recorded fragment, mortgage cues,
borrower/lender priority lists with cleanup split + truncation). The Column
versions must agree with the Python versions on realistic strings, and the
DataFrame money scorer must agree with the UDF/pure scorer including the
TOTAL-without-$ fallback (ocr_tax_extractor.py:500-544)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark.functions import extract
from gsccca_tax_records_scraper_spark.operators import scoring

# strings shaped like the reference's own pattern targets
HEADERS = [
    "Filed and Recorded Aug 12, 2004 03:06pm clerk of court",
    "Filed & Recorded on the 12th day, 2009 misc",
    "FILED AND RECORDED July 1st, 1999",
    "recorded earlier, see July 14, 2004 entry",
    "numeric only 07/14/2004 header",
    "7-4-98 short year form",
    "no date at all",
    "",
]
BODIES = [
    "made this 5th day of June, 2012 by the undersigned",
    "This deed, made this 1st day of January, 2020, WITNESSETH",
    "dated March 14, 2008 between the parties",
    "effective the 3rd day of 2019 fiscal year",
    "nothing cued, but 12/31/2020 appears",
    "no date here either",
    "",
]
PARTY_BODIES = [
    "Borrower: JOHN Q PUBLIC\nLender: FIRST BANK OF MACON",
    "Borrowers - JANE DOE AND JOHN DOE, husband and wife",
    'made this 1st day of May, 2005, ACME LLC ("Borrower") promises',
    'MARY SMITH ("Borrower") conveys to HOMESTEAD SAVINGS ("Lender")',
    "Mortgagee: PEACH STATE CREDIT UNION\nin favor of NOBODY, really",
    "in favor of COASTAL LENDING GROUP,LLC and assigns",
    "in favor of Acme Lending, a Georgia corporation.",  # trailing-\b miss
    "B" * 300 + ' ("Borrower")',  # truncation path
    "no parties at all",
    "",
]


def test_find_first_date_priority():
    # month-name beats numeric even when numeric comes first in the text
    assert (
        extract.find_first_date("on 01/02/2003 then July 14, 2004")
        == "July 14, 2004"
    )
    assert extract.find_first_date("only 7-4-98 here") == "7-4-98"
    assert extract.find_first_date("Jan 3rd, 2001") == "Jan 3rd, 2001"
    assert extract.find_first_date("nothing") == ""


def test_assignment_date_fragment_fallback():
    # fragment with no parseable date -> normalized fragment itself
    got = extract.extract_assignment_date("Filed & Recorded on the 12th day, 2009 misc")
    assert got == "Filed & Recorded on the 12th day, 2009"
    # fragment with a date -> just the date
    assert (
        extract.extract_assignment_date("Filed and Recorded Aug 12, 2004 03:06pm")
        == "Aug 12, 2004"
    )
    # no Filed-and-Recorded cue -> first date anywhere
    assert extract.extract_assignment_date("header 07/14/2004 x") == "07/14/2004"


def test_mortgage_date_cue_priority():
    # 'made this' outranks 'dated' when both appear
    body = "dated March 14, 2008 and made this 5th day of June, 2012"
    assert extract.extract_mortgage_date(body) == "5th day of June, 2012"
    assert extract.extract_mortgage_date("dated March 14, 2008 x") == "March 14, 2008"
    assert extract.extract_mortgage_date("plain 12/31/2020 body") == "12/31/2020"


def test_name_lender_cleanup_and_truncation():
    assert extract.extract_name("Borrower: JOHN Q PUBLIC\nrest") == "JOHN Q PUBLIC"
    long = extract.extract_name("Borrower: " + "A" * 300)
    assert len(long) == 120
    assert (
        extract.extract_lender("Lender: FIRST BANK. Second sentence")
        == "FIRST BANK"
    )
    assert (
        extract.extract_lender("in favor of COASTAL LENDING GROUP,LLC and assigns")
        == "COASTAL LENDING GROUP"
    )
    assert len(extract.extract_lender("Mortgagee: " + "L" * 300)) == 140
    # reference pattern parity (realestate_ocr_extractor.py:44): the trailing
    # \b makes "in favor of X, <space>..." / "X.<eol>" fall through the
    # cascade instead of matching at the comma
    assert extract.extract_lender("in favor of Acme Lending, a Georgia corporation.") == ""


def test_cascade_columns_match_python(spark):
    rows = [(i, h, b, p) for i, (h, b, p) in enumerate(
        [(h, b, p) for h in HEADERS for b in BODIES[:3] for p in PARTY_BODIES[:3]]
        + list(zip(HEADERS[:7], BODIES[:7], PARTY_BODIES[:7]))
    )]
    df = spark.createDataFrame(rows, "id long, header string, body string, party string")
    out = df.select(
        "id",
        extract.assignment_date_col(F.col("header")).alias("ad"),
        extract.mortgage_date_col(F.col("body")).alias("md"),
        extract.name_col(F.col("party")).alias("nm"),
        extract.lender_col(F.col("party")).alias("ld"),
    ).collect()
    by_id = {r.id: r for r in out}
    for i, h, b, p in rows:
        r = by_id[i]
        assert r.ad == extract.extract_assignment_date(h), ("assign", h)
        assert r.md == extract.extract_mortgage_date(b), ("mortgage", b)
        assert r.nm == extract.extract_name(p), ("name", p)
        assert r.ld == extract.extract_lender(p), ("lender", p)


def test_money_scored_df_matches_pure_scorer(spark):
    texts = [
        "INTEREST $50.00\nTOTAL DUE: $1,000.00\nRANDOM $2.00",
        "PAID S500 partial\nTOTAL LIEN 1,234.50 open",  # S-fixup + fallback
        "TOTAL 88.20 only bare decimals\nBALANCE DUE 12.10",
        "§75.00 noise line\nTAX $120.00",
        "no money at all",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, list] = {}
    for r in scoring.money_scored_topk_df(df, "text", "doc_id", k=3).collect():
        got.setdefault(r.doc_id, []).append((r.rank, r.raw, r.score))
    for i, t in enumerate(texts):
        expected = extract.score_money_candidates(t)[:3]
        rows = sorted(got.get(i, []))
        assert [raw for _, raw, _ in rows] == [raw for _, raw in expected], t
        for (_, _, s), (es, _) in zip(rows, expected):
            assert s == pytest.approx(es, abs=1e-3), t
