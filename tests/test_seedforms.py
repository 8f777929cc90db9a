"""S1 seed-form schema + real-estate entity frontier (SURVEY §2 scans).

Mirrors: lien form fill (lien_index_scraper.py:331-354), RE entity radio
iteration + per-entity ordered-dict URL dedup + the (url, status,
search_name, entity_index, doc_index) frontier frame
(realestate_index_scraper.py:422-490)."""

from __future__ import annotations

from gsccca_tax_records_scraper_spark import sitegen
from gsccca_tax_records_scraper_spark.functions import urltools
from gsccca_tax_records_scraper_spark.sources import seedforms

FORMS = [
    {"search_name": "ACME HOLDINGS", "county": "44", "party_type": "2",
     "instrument_type": "1", "from_date": "01/01/2020", "to_date": "12/31/2024"},
    {"search_name": "DOE JOHN", "county": "7"},
]


def test_seed_id_deterministic_and_field_sensitive():
    a = seedforms.seed_id_of_form(FORMS[0])
    assert a == seedforms.seed_id_of_form(dict(FORMS[0]))  # stable
    b = seedforms.seed_id_of_form({**FORMS[0], "county": "45"})
    assert a != b  # any field change reseeds
    # defaults mirror form_data.get(..., '100'/'1')
    assert seedforms.seed_id_of_form({"search_name": "X"}) == seedforms.seed_id_of_form(
        {"search_name": "X", "max_rows": "100", "table_type": "1"}
    )


def test_expand_forms_schema(spark):
    df = seedforms.expand_forms(spark, FORMS)
    assert df.columns == ["seed_id", *seedforms.FORM_FIELDS]
    rows = {r.search_name: r for r in df.collect()}
    assert rows["ACME HOLDINGS"].county == "44"
    assert rows["DOE JOHN"].max_rows == "100"  # padded default


def test_realestate_frontier_matches_reference_shape(spark):
    out = seedforms.realestate_entity_frontier(spark, FORMS).collect()
    assert {r.search_name for r in out} == {"ACME HOLDINGS", "DOE JOHN"}
    for name in ("ACME HOLDINGS", "DOE JOHN"):
        got = sorted(
            [r for r in out if r.search_name == name],
            key=lambda r: (r.entity_index, r.doc_index),
        )
        # reproduce the reference loop in plain python
        want = []
        for e in range(1, sitegen.n_re_entities(name) + 1):
            urls, seen = [], set()
            for raw in urltools.extract_raw_hrefs(sitegen.re_entity_html(name, e)):
                u = urltools.canonicalize(sitegen.RE_BASE, raw)
                if u not in seen:
                    seen.add(u)
                    urls.append(u)
            want.extend((u, "", name, e, j + 1) for j, u in enumerate(urls))
        assert [(r.url, r.status, r.search_name, r.entity_index, r.doc_index) for r in got] == want
        # per-entity dedup really fired (the generator plants duplicates)
        assert all(r.status == "" for r in got)
    # duplicates exist pre-dedup for at least one entity across the forms
    dup_found = any(
        len(sitegen.re_entity_doc_nos(n, e))
        > len(dict.fromkeys(sitegen.re_entity_doc_nos(n, e)))
        for n in ("ACME HOLDINGS", "DOE JOHN")
        for e in range(1, sitegen.n_re_entities(n) + 1)
    )
    assert dup_found


def test_bootstrap_forms_equivalent_to_seed_ids(spark, tmp_path):
    from gsccca_tax_records_scraper_spark.plans.epoch import CrawlEngine

    e1 = CrawlEngine(spark, tmp_path / "a", epoch_seconds=60.0)
    ids = e1.bootstrap_forms(FORMS)
    e2 = CrawlEngine(spark, tmp_path / "b", epoch_seconds=60.0)
    e2.bootstrap(ids)
    f1 = {r.url for r in e1.store.read_snapshot(spark, "frontier", 0).collect()}
    f2 = {r.url for r in e2.store.read_snapshot(spark, "frontier", 0).collect()}
    assert f1 == f2 and len(f1) > 0
