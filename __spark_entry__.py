"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes one entry per implemented operator family from
SURVEY.md §2 (+ the training-data-pipeline operators), each with a matching
DuckDB oracle in `oracle_sql()`. Crawl-engine-specific operators whose state
machinery is not SQL-expressible (bloom/cuckoo dedup state, politeness token
bucket, epoch resume) are verified in tests/ against the pure-Python
simulator instead; two rows-only entries expose their plumbing here.

Column names are aliased identically on both sides (driver compare sorts
columns by name and hashes values). Float aggregates are rounded on both
sides to dodge summation-order ulps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark.operators import (
    components,
    multimodal,
    similarity,
    textdedup,
    textstats,
    winnow,
)
from gsccca_tax_records_scraper_spark.operators.textstats import (
    BPE_TOKEN_PATTERN,
    CJK_PATTERN,
    EN_STOPWORDS,
)

SIMHASH_BITS = 16


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship: corpus-curation pipeline over documents (dedup + quality + stats)
# --------------------------------------------------------------------------

def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus curation summary: quality, token counts, near-dup
    pressure (minhash-LSH candidates). Exercises scan→explode→agg→join→agg."""
    docs = _t(spark, sf_dir, "documents")
    sigs = textdedup.minhash_signatures(docs, n_bands=4)
    pairs = textdedup.lsh_candidate_pairs(sigs)
    dup_counts = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_cand"))
    )
    enriched = (
        docs.withColumn("quality", textstats.quality_score(F.col("text")))
        .withColumn("ws_tokens", textstats.ws_token_count(F.col("text")))
        .join(dup_counts, "doc_id", "left")
        .withColumn("n_dup_cand", F.coalesce("n_dup_cand", F.lit(0)))
    )
    return (
        enriched.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.sum("ws_tokens").alias("total_tokens"),
            F.sum(F.when(F.col("n_dup_cand") > 0, 1).otherwise(0)).alias("docs_with_dups"),
        )
        .orderBy("source")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# shared SQL fragments for the oracle side
# --------------------------------------------------------------------------

_SHINGLES_SQL = (
    "list_distinct(list_transform("
    " generate_series(1, greatest(len(string_split(text,' '))-2, 1)),"
    " i -> concat_ws(' ', string_split(text,' ')[i], string_split(text,' ')[i+1],"
    "                string_split(text,' ')[i+2])))"
)
_SW_LIST = "(" + ", ".join(f"'{s}'" for s in EN_STOPWORDS) + ")"
_SW_RATIO_SQL = (
    f"len(list_filter(string_split(lower(text),' '), t -> t in {_SW_LIST}))::DOUBLE"
    " / greatest(len(string_split(lower(text),' ')), 1)"
)
_MWL_SQL = (
    "list_sum(list_transform(regexp_split_to_array(trim(text),'\\s+'), t -> length(t)))::DOUBLE"
    " / greatest(len(regexp_split_to_array(trim(text),'\\s+')), 1)"
)
_QUALITY_SQL = (
    "round(((case when length(text) between 100 and 10000 then 1.0 else 0.25 end)"
    " + (case when len(regexp_extract_all(text,'[^\\w\\s]'))::DOUBLE/greatest(length(text),1) <= 0.2 then 1.0 else 0.5 end)"
    f" + (case when {_SW_RATIO_SQL} >= 0.01 then 1.0 else 0.5 end)"
    f" + (case when {_MWL_SQL} between 2.0 and 12.0 then 1.0 else 0.5 end)) / 4.0, 4)"
)

_SIMHASH_SUMS_SQL = ", ".join(
    f"sum(case when (('0x'||substr(md5(tok),1,15))::BIGINT >> {b}) & 1 = 1"
    f" then 1 else -1 end) as s{b}"
    for b in range(SIMHASH_BITS)
)
_SIMHASH_FP_SQL = " + ".join(
    f"(case when s{b} > 0 then {1 << b} else 0 end)" for b in range(SIMHASH_BITS)
)
_SIMHASH_CTE = (
    "with ex as (select doc_id, unnest(list_distinct(string_split(text,' '))) as tok"
    " from documents), "
    f"wide as (select doc_id, {_SIMHASH_SUMS_SQL} from ex group by doc_id), "
    f"fp as (select doc_id, ({_SIMHASH_FP_SQL})::BIGINT as simhash from wide)"
)


# --------------------------------------------------------------------------
# the query registry: name -> (spark_fn, oracle_sql | None)
# --------------------------------------------------------------------------

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _q(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


# ---- scans / filters / projections (SURVEY P1-P10) ------------------------

@_q(
    "status_filter_resume",
    "SELECT o_orderkey, o_orderstatus FROM orders"
    " WHERE lower(trim(o_orderstatus)) <> 'f'",
)
def q_status_filter(spark, sf):
    o = _t(spark, sf, "orders")
    return o.filter(F.lower(F.trim(F.col("o_orderstatus"))) != "f").select(
        "o_orderkey", "o_orderstatus"
    )


@_q(
    "predicate_filter_suite",
    "SELECT 'junk' AS rule, doc_id FROM documents WHERE NOT contains(lower(text), 'spark')"
    " UNION ALL SELECT 'skipwords', doc_id FROM documents"
    "   WHERE NOT regexp_matches(text, 'stream|window')"
    " UNION ALL SELECT 'substr', doc_id FROM documents WHERE contains(text, 'merge')"
    " UNION ALL SELECT 'minlen', doc_id FROM documents WHERE length(text) >= 300",
)
def q_predicate_suite(spark, sf):
    """P2 junk-URL filter + P4 skip-words + J5 substring filter-join + P9
    min-length, as one tagged union: each predicate stays individually
    observable inside ONE registry entry (the driver's correctness gate
    records only the first 50 entries, so redundant single-predicate entries
    were merged — VERDICT r2 #1)."""
    d = _t(spark, sf, "documents")

    def tag(rule: str, cond):
        return d.filter(cond).select(F.lit(rule).alias("rule"), "doc_id")

    return (
        tag("junk", ~F.lower(F.col("text")).contains("spark"))
        .unionByName(tag("skipwords", ~F.col("text").rlike("stream|window")))
        .unionByName(tag("substr", F.col("text").contains("merge")))
        .unionByName(tag("minlen", F.length("text") >= 300))
    )


@_q(
    "projection_pad",
    "SELECT c_custkey, coalesce(c_name,'') AS name, coalesce(c_mktsegment,'') AS segment"
    " FROM customer",
)
def q_projection_pad(spark, sf):
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.coalesce("c_name", F.lit("")).alias("name"),
        F.coalesce("c_mktsegment", F.lit("")).alias("segment"),
    )


# ---- joins (SURVEY J1-J6) --------------------------------------------------

@_q(
    "anti_join_unseen",
    "SELECT c_custkey FROM customer c WHERE NOT EXISTS"
    " (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def q_anti_join(spark, sf):
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@_q(
    "upsert_insert_set",
    "SELECT s_suppkey, s_name FROM supplier s WHERE NOT EXISTS"
    " (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)",
)
def q_upsert_insert(spark, sf):
    s, li = _t(spark, sf, "supplier"), _t(spark, sf, "lineitem")
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_anti").select("s_suppkey", "s_name")


@_q(
    "dim_broadcast_join",
    "SELECT r.r_name, count(*) AS n_customers FROM customer c"
    " JOIN nation n ON c.c_nationkey = n.n_nationkey"
    " JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name",
)
def q_dim_broadcast(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
    )


def _viewer_vars_of_key(k: int) -> dict:
    """Deterministic viewer-var synthesis from an integer key (both sides of
    the contract build the same values; user goes missing for k%11==0 to
    exercise the all-vars-present gate)."""
    return {
        "iLienID": str(k), "book": str(k % 900 + 1), "page": str(k % 97 + 1),
        "county": str(k % 159 + 1),
        "user": "" if k % 11 == 0 else "745", "appid": "4",
    }


def _viewer_url_lookup_sql() -> str:
    from gsccca_tax_records_scraper_spark.functions.extract import viewer_url

    target = viewer_url(_viewer_vars_of_key(42))
    return (
        "WITH t AS (SELECT o_orderkey, CASE WHEN o_orderkey % 11 = 0 THEN ''"
        " ELSE 'https://search.gsccca.org/Imaging/HTML5Viewer.aspx?id=' || o_orderkey"
        " || '&key1=' || (o_orderkey % 900 + 1) || '&key2=' || (o_orderkey % 97 + 1)"
        " || '&county=' || (o_orderkey % 159 + 1) || '&userid=745&appid=4' END"
        " AS pdf_document_url FROM orders)"
        f" SELECT o_orderkey, pdf_document_url FROM t WHERE pdf_document_url = '{target}'"
    )


@_q("viewer_url_lookup", None)  # SQL attached below (built from viewer_url)
def q_viewer_url_lookup(spark, sf):
    """F2 viewer-URL synthesis + J3 equi-lookup: assemble pdf_document_url
    from the 6 JS vars (lien_index_scraper.py:661-665) and look one record up
    by it — the dashboard export's access path (dashboard/views.py:122)."""
    from gsccca_tax_records_scraper_spark.functions.extract import (
        viewer_url,
        viewer_url_col,
    )

    k = F.col("o_orderkey")
    d = _t(spark, sf, "orders").select(
        "o_orderkey",
        viewer_url_col(
            k, (k % 900 + 1), (k % 97 + 1), (k % 159 + 1),
            F.when(k % 11 == 0, F.lit("")).otherwise(F.lit("745")),
            F.lit("4"),
        ).alias("pdf_document_url"),
    )
    target = viewer_url(_viewer_vars_of_key(42))
    return d.filter(F.col("pdf_document_url") == target).select(
        "o_orderkey", "pdf_document_url"
    )


_REGISTRY["viewer_url_lookup"] = (q_viewer_url_lookup, _viewer_url_lookup_sql())


# ---- aggregations (SURVEY A1-A8) -------------------------------------------

@_q(
    "argmax_order",
    "SELECT o_custkey, o_orderkey AS best_order, o_totalprice AS best_price FROM orders"
    " QUALIFY row_number() OVER (PARTITION BY o_custkey"
    " ORDER BY o_totalprice DESC, o_orderkey) = 1",
)
def q_argmax(spark, sf):
    # max_by with a composite ordering struct instead of a row_number
    # window (guide §2.3 "aggregate before you shuffle"): the partial
    # aggregation collapses rows map-side BEFORE the exchange and the
    # post-shuffle sort disappears. Maximizing (o_totalprice, -o_orderkey)
    # == highest price, ties to the LOWEST orderkey — exactly the window's
    # (price DESC, orderkey ASC) first row; both key columns are non-null
    # by construction. Values asserted equal at sf0.1; 0.31s -> 0.26s
    # settled at local[32].
    o = _t(spark, sf, "orders")
    best = o.groupBy("o_custkey").agg(
        F.max_by(
            F.struct(
                F.col("o_orderkey").alias("best_order"),
                F.col("o_totalprice").alias("best_price"),
            ),
            F.struct(F.col("o_totalprice"), (-F.col("o_orderkey"))),
        ).alias("b")
    )
    return best.select("o_custkey", "b.best_order", "b.best_price")


# A2 scored-top-k evidence rides `money_scored_topk` (the reference-exact
# scorer); A3 group-count rides `tumbling_window_agg`/`dim_broadcast_join`
# (both aggregate counts) — the standalone generic entries were retired to
# fit the driver's 50-entry correctness window (VERDICT r2 #1).

@_q("distinct_dedup", "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
def q_distinct(spark, sf):
    return _t(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@_q(
    "latest_by",
    "SELECT user_id, event_id AS last_event FROM events"
    " QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1",
)
def q_latest_by(spark, sf):
    # max_by instead of a row_number window (same move as q_argmax):
    # maximizing (ts, event_id) is the window's (ts DESC, event_id DESC)
    # first row; partial aggregation collapses map-side, no window sort
    e = _t(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.max_by("event_id", F.struct("ts", "event_id")).alias("last_event")
    )


@_q(
    "colwidth_max",
    "SELECT max(length(c_name)) AS w_name, max(length(c_mktsegment)) AS w_segment"
    " FROM customer",
)
def q_colwidth(spark, sf):
    c = _t(spark, sf, "customer")
    return c.agg(
        F.max(F.length("c_name")).alias("w_name"),
        F.max(F.length("c_mktsegment")).alias("w_segment"),
    )


@_q(
    "line_reconstruction",
    "SELECT l_orderkey, string_agg(l_returnflag, '' ORDER BY l_linenumber, l_returnflag)"
    " AS flags FROM lineitem GROUP BY l_orderkey",
)
def q_line_reconstruction(spark, sf):
    # Project to the 3 needed columns and hash-spread on the GROUP KEY
    # before the collect: collect_list's partial aggregation doesn't reduce
    # bytes (it only wraps rows into lists), so shuffling the raw slim rows
    # by l_orderkey is byte-neutral at any scale and moves the whole
    # collect+sort into one post-shuffle stage at full parallelism — the
    # single-row-group local file otherwise serializes the partial
    # ObjectHashAggregate on the 1-task scan (0.82s -> 0.44s settled,
    # 1.85s -> 0.57s first at sf0.1/local[32]).
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    ).repartition("l_orderkey")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("l_linenumber", "l_returnflag"))
                ),
                lambda x: x.getField("l_returnflag"),
            ),
            "",
        ).alias("flags")
    )


# ---- windows (SURVEY W1-W4) ------------------------------------------------

@_q(
    "row_number_seq",
    "SELECT event_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    " AS rn, round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id"
    " ROWS UNBOUNDED PRECEDING), 2) AS cum FROM events",
)
def q_row_number(spark, sf):
    # W1 sequence numbering + running sum over the same window (one entry)
    e = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return e.select(
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.round(F.sum("value").over(wsum), 2).alias("cum"),
    )


@_q(
    "lag_gap",
    "SELECT user_id, event_id, round((epoch_us(ts) - lag(epoch_us(ts)) OVER"
    " (PARTITION BY user_id ORDER BY ts, event_id)) / 1000000.0, 3) AS gap_sec"
    " FROM events QUALIFY gap_sec > 600",
)
def q_lag_gap(spark, sf):
    e = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = F.round((us - F.lag(us).over(w)) / 1000000.0, 3)
    return (
        e.withColumn("gap_sec", gap)
        .filter(F.col("gap_sec") > 600)
        .select("user_id", "event_id", "gap_sec")
    )


@_q(
    "politeness_rank_cap",
    "SELECT event_type, event_id FROM events"
    " QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) <= 5",
)
def q_rank_cap(spark, sf):
    e = _t(spark, sf, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "event_id")
    )


# ---- sorts / limits / top-k (SURVEY O1-O5) ---------------------------------

@_q(
    "global_topk",
    "SELECT o_orderkey, o_totalprice FROM orders"
    " QUALIFY row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) <= 10",
)
def q_global_topk(spark, sf):
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k
    # heaps + a bounded merge — no single-task global sort (a window over an
    # unpartitioned ORDER BY would sort the whole table in one task)
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@_q(
    "first_match_fallback",
    "SELECT doc_id, coalesce(nullif(regexp_extract(text, '(spark [a-z]+)', 1), ''),"
    " nullif(regexp_extract(text, '(stream [a-z]+)', 1), ''), '') AS m,"
    " substring(text, 1, 40) AS prefix FROM documents",
)
def q_first_match(spark, sf):
    # O4 first-match fallback + O5 truncation (one entry)
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.coalesce(
            F.nullif(F.regexp_extract("text", r"(spark [a-z]+)", 1), F.lit("")),
            F.nullif(F.regexp_extract("text", r"(stream [a-z]+)", 1), F.lit("")),
            F.lit(""),
        ).alias("m"),
        F.substring("text", 1, 40).alias("prefix"),
    )


# ---- set ops (SURVEY U1-U5) ------------------------------------------------

@_q(
    "union_frontier",
    "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'"
    " UNION ALL SELECT o_orderkey FROM orders WHERE o_totalprice > 400000",
)
def q_union(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        .unionByName(o.filter(F.col("o_totalprice") > 400000).select("o_orderkey"))
    )


@_q(
    "setops_except_intersect",
    "SELECT 'except' AS op, c FROM (SELECT o_custkey AS c FROM orders EXCEPT"
    " SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')"
    " UNION ALL SELECT 'intersect', c FROM (SELECT c_custkey AS c FROM customer"
    " WHERE c_mktsegment = 'BUILDING' INTERSECT SELECT o_custkey FROM orders)",
)
def q_setops(spark, sf):
    # U3 except + U4 intersect, tagged into one entry
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    ex = (
        o.select(F.col("o_custkey").alias("c"))
        .subtract(o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c")))
        .select(F.lit("except").alias("op"), "c")
    )
    inter = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("c"))
        .intersect(o.select(F.col("o_custkey").alias("c")))
        .select(F.lit("intersect").alias("op"), "c")
    )
    return ex.unionByName(inter)


@_q(
    "dedup_preserve_order",
    "SELECT doc_id, len(string_split(text,' ')) AS n_tokens,"
    " len(list_distinct(string_split(text,' '))) AS n_distinct FROM documents",
)
def q_dedup_order(spark, sf):
    d = _t(spark, sf, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


# ---- scalar functions (SURVEY F1-F16) --------------------------------------

@_q(
    "regex_priority_extract",
    "SELECT o_orderkey, regexp_extract(o_orderpriority, '^([0-9]+)', 1)::INT AS pri_num"
    " FROM orders",
)
def q_regex_priority(spark, sf):
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1).cast("int").alias("pri_num"),
    )


@_q(
    "date_buckets",
    "SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n,"
    " round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1, 2",
)
def q_date_buckets(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))


# F10 hashing evidence rides `doc_fingerprint` (md5 over normalized tokens)
# and `exact_dup_groups` (md5 grouping); the redundant raw-md5 entry was
# retired for the 50-entry window.

@_q(
    "json_extract",
    "SELECT event_id, json_extract_string(props, '$.k')::INT AS k FROM events",
)
def q_json(spark, sf):
    return _t(spark, sf, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


@_q(
    "slug_format",
    "SELECT c_custkey, printf('%s_%05d', lower(replace(c_mktsegment, ' ', '')), c_custkey)"
    " AS slug FROM customer",
)
def q_slug(spark, sf):
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.format_string(
            "%s_%05d", F.lower(F.regexp_replace("c_mktsegment", " ", "")), F.col("c_custkey")
        ).alias("slug"),
    )


@_q(
    "hyperlink_formula",
    "SELECT doc_id, CASE WHEN trim(name) <> '' THEN"
    " '=HYPERLINK(\"file:///docs/' || name || '\", \"' || name || '\")'"
    " ELSE '' END AS view_pdf FROM ("
    " SELECT doc_id, CASE WHEN n_chars % 7 = 0 THEN ''"
    "   ELSE doc_id || '.pdf' END AS name FROM documents)",
)
def q_hyperlink(spark, sf):
    from gsccca_tax_records_scraper_spark.sources.sinks import hyperlink_formula_col

    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("n_chars") % 7 == 0, F.lit("")).otherwise(
            F.concat(F.col("doc_id"), F.lit(".pdf"))
        ).alias("name"),
    )
    return d.select("doc_id", hyperlink_formula_col("docs", F.col("name")).alias("view_pdf"))


@_q(
    "two_stage_total_recovery",
    "WITH t AS (SELECT o_orderkey AS doc_id,"
    " CASE WHEN o_orderkey % 3 = 0 THEN 'partial scan, no totals line'"
    "   ELSE 'TOTAL DUE: $' || ((o_orderkey * 13) % 9000 + 100) || '.25' END AS text,"
    " 'ROI TOTAL ' || ((o_orderkey * 13) % 9000 + 100) || '.25 recovered' AS roi_text"
    " FROM orders),"
    " c AS (SELECT doc_id, roi_text,"
    "   regexp_extract(text, 'TOTAL DUE: \\$([\\d,]+\\.\\d{2})', 1) AS total FROM t)"
    " SELECT doc_id, total, 'cheap' AS source FROM c WHERE total <> ''"
    " UNION ALL"
    " SELECT doc_id, regexp_extract(roi_text, '([\\d,]+\\.\\d{2})', 1) AS total,"
    "  'roi' AS source FROM c WHERE total = ''",
)
def q_two_stage(spark, sf):
    """§4 conditional expensive path: cheap TOTAL regex for all rows, the
     'expensive' ROI recovery only for the miss subset (here a Column stand-in
    for the PaddleOCR call; the operator takes any DataFrame->DataFrame)."""
    from gsccca_tax_records_scraper_spark.operators.twostage import two_stage_extract

    k = F.col("o_orderkey")
    amt = ((k * 13) % 9000 + 100).cast("string")
    t = _t(spark, sf, "orders").select(
        k.alias("doc_id"),
        F.when(k % 3 == 0, F.lit("partial scan, no totals line")).otherwise(
            F.concat(F.lit("TOTAL DUE: $"), amt, F.lit(".25"))
        ).alias("text"),
        F.concat(F.lit("ROI TOTAL "), amt, F.lit(".25 recovered")).alias("roi_text"),
    )
    out = two_stage_extract(
        t,
        cheap={
            "total": F.regexp_extract("text", r"TOTAL DUE: \$([\d,]+\.\d{2})", 1),
            "source": F.lit("cheap"),
        },
        missing=F.col("total") == "",
        expensive=lambda miss: miss.withColumn(
            "total", F.regexp_extract("roi_text", r"([\d,]+\.\d{2})", 1)
        ).withColumn("source", F.lit("roi")),
    )
    return out.select("doc_id", "total", "source")


@_q(
    "case_contains",
    "SELECT count(*) AS n FROM part WHERE contains(lower(p_type), 'brass')",
)
def q_case_contains(spark, sf):
    p = _t(spark, sf, "part")
    return p.filter(F.lower(F.col("p_type")).contains("brass")).agg(
        F.count("*").alias("n")
    )


# ---- pipeline classics -----------------------------------------------------

@_q(
    "tpch_q1",
    "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,"
    " round(sum(l_extendedprice), 2) AS sum_base,"
    " round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,"
    " count(*) AS n FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'"
    " GROUP BY l_returnflag, l_linestatus",
)
def q_tpch_q1(spark, sf):
    # Examined for scan-spread (the test table is a single-row-group file,
    # so scan + partial agg run on one task): a hash repartition on
    # l_orderkey between scan and aggregate was MEASURED SLOWER (settled
    # 0.44s -> 0.62s, first +0.7s at sf0.1/local[32]) — the partial
    # aggregation collapses 600k rows to 6 groups inside the scan stage, so
    # the exchange only added shuffle + codegen. Left on the scan's
    # partitioning deliberately.
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc"
            ),
            F.count("*").alias("n"),
        )
    )


@_q(
    "revenue_by_segment",
    "SELECT c_mktsegment, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,"
    " count(DISTINCT o_orderkey) AS n_orders FROM customer c"
    " JOIN orders o ON c.c_custkey = o.o_custkey"
    " JOIN lineitem l ON o.o_orderkey = l.l_orderkey GROUP BY c_mktsegment",
)
def q_revenue_segment(spark, sf):
    # Aggregate lineitem by l_orderkey FIRST (guide §2.3 "aggregate before
    # you shuffle"): the fact-table rows collapse 4:1 before any join, the
    # join then attaches dims to 1/4 the rows, and count(DISTINCT
    # o_orderkey) becomes a plain count(*) — each surviving orderkey is one
    # row by construction — which removes the two-level distinct
    # aggregation (its extra exchange on (segment, orderkey)). Same rows,
    # same rounded sums: the per-order partial sums only re-associate an
    # addition Spark already performs in arbitrary partial-agg order.
    # 0.74s -> 0.37s settled, 1.60s -> 0.63s first at sf0.1/local[32].
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    # Hash-spread on the group key between scan and aggregate (same
    # rationale as q_tpch_q1: single-row-group scan = 1-task partial agg).
    # The repartition's hashpartitioning(l_orderkey) satisfies the
    # groupBy's distribution requirement, so no second exchange appears —
    # the per-order aggregation runs fully parallel after one slim shuffle.
    per_order = (
        li.select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
        )
    )
    return (
        per_order.join(
            o.select("o_orderkey", "o_custkey"),
            per_order.l_orderkey == F.col("o_orderkey"),
        )
        .join(c.select("c_custkey", "c_mktsegment"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("__rev"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@_q(
    "tumbling_window_agg",
    "SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,"
    " event_type, count(*) AS n, round(sum(value), 2) AS total FROM events GROUP BY 1, 2",
)
def q_tumbling_window(spark, sf):
    from gsccca_tax_records_scraper_spark.streaming.windows import tumbling_metrics

    out = tumbling_metrics(_t(spark, sf, "events"), "1 hour")
    # format the NTZ wall-clock value directly: no session-timezone
    # dependence either side
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
        "event_type", "n", "total",
    )


# ---- crawl-engine plumbing ---------------------------------------------------
# The driver records only the FIRST 50 registry entries. As of round 3 the
# registry holds <= 50 entries total (redundant generic entries were merged —
# see VERDICT r2 #1), so every operator family has a CORRECTNESS row;
# tools/check_contract.py asserts the <=50 invariant.
#
# These two entries don't read the parquet tables — their input is the
# deterministic synthetic site (sitegen), which DuckDB can't regenerate (no
# sha1 in DuckDB 1.0, and href extraction is string parsing). The oracle
# therefore embeds the PRE-dedup candidate rows as a VALUES literal computed
# by the pure-Python path (sitegen + urltools — the same code the simulator
# trusts, cross-checked against the JVM in tests/test_functions.py) and
# recomputes the operator under test (junk filter + keep-first dedup +
# renumbering) in SQL. The literal is rebuilt from sitegen at import, so it
# cannot drift; what the oracle genuinely cross-checks is Python-vs-JVM sha1
# url ids and SQL-vs-engine dedup/renumber semantics.


def _crawl_canonicalize_rows() -> list[tuple[str, int, int, int, int]]:
    """(url, url_id, seed_id, page, link_order) for every canonicalized SERP
    candidate, PRE junk-filter and PRE dedup — shared by the Spark query's
    input builder and the oracle's VALUES literal."""
    from gsccca_tax_records_scraper_spark import sitegen
    from gsccca_tax_records_scraper_spark.functions import urltools

    rows = []
    for seed_id in range(8):
        for page in range(1, sitegen.n_serp_pages(seed_id) + 1):
            base = sitegen.serp_base_url(seed_id, page)
            for i, raw in enumerate(urltools.extract_raw_hrefs(sitegen.serp_html(seed_id, page))):
                u = urltools.canonicalize(base, raw)
                rows.append((u, urltools.url_id(u), seed_id, page, i))
    return rows


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _crawl_canonicalize_sql() -> str:
    vals = ",\n".join(
        f"({_sql_str(u)}, {uid}, {s}, {p}, {lo})"
        for (u, uid, s, p, lo) in _crawl_canonicalize_rows()
    )
    # mirrors P2 (maxrows junk filter) + J1 keep-first (partition url_id,
    # order by crawl_order = (depth=const, seed_id, page, link_order))
    return f"""
WITH cand(url, url_id, seed_id, page, link_order) AS (VALUES
{vals}
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY url_id ORDER BY seed_id, page, link_order) AS rn
  FROM cand WHERE NOT contains(lower(url), 'maxrows')
)
SELECT url, url_id, seed_id, page, link_order FROM ranked WHERE rn = 1
"""


def _q_crawl_canonicalize(spark, sf):
    """F1/F2/F8 + J1 keep-first over a deterministic synthetic SERP batch.
    Full value oracle: the canonicalized candidates are embedded as a VALUES
    literal (sha1 url_id pinned from the Python side, which
    tests/test_functions.py proves equal to the JVM's) and the junk filter +
    keep-first dedup are recomputed in SQL."""
    from gsccca_tax_records_scraper_spark.functions import urltools
    from gsccca_tax_records_scraper_spark.operators.dedup import keep_first_in_batch

    rows = [(u, s, p, lo) for (u, _uid, s, p, lo) in _crawl_canonicalize_rows()]
    df = spark.createDataFrame(rows, "url string, seed_id long, page int, link_order int")
    cand = (
        df.filter(~F.lower(F.col("url")).contains("maxrows"))
        .withColumn("url_id", urltools.url_id_col(F.col("url")))
        .withColumn(
            "crawl_order",
            F.struct(
                F.col("seed_id"), F.col("page"), F.col("link_order"),
                F.lit(1).alias("depth"),
            ),
        )
    )
    return keep_first_in_batch(cand).select(
        "url", "url_id", "seed_id", "page", "link_order"
    )


_REGISTRY["crawl_canonicalize_dedup"] = (_q_crawl_canonicalize, _crawl_canonicalize_sql())


_REALESTATE_FORMS = [
    {"search_name": f"SMITH {i}", "county": str(i % 159 + 1),
     "party_type": "2", "instrument_type": "1",
     "from_date": "01/01/2015", "to_date": "12/31/2024"}
    for i in range(6)
]


def _realestate_raw_rows() -> list[tuple[str, str, int, int]]:
    """(url, search_name, entity_index, raw_order): every final.asp link of
    every entity page in document order, PRE dedup — the ordered-dict
    keep-first and doc_index renumbering stay for the oracle SQL to redo."""
    from gsccca_tax_records_scraper_spark import sitegen
    from gsccca_tax_records_scraper_spark.functions import urltools

    rows = []
    for name in sorted({f["search_name"] for f in _REALESTATE_FORMS}):
        for entity_idx in range(1, sitegen.n_re_entities(name) + 1):
            for j, raw in enumerate(
                urltools.extract_raw_hrefs(sitegen.re_entity_html(name, entity_idx))
            ):
                rows.append(
                    (urltools.canonicalize(sitegen.RE_BASE, raw), name, entity_idx, j)
                )
    return rows


def _realestate_frontier_sql() -> str:
    vals = ",\n".join(
        f"({_sql_str(u)}, {_sql_str(n)}, {e}, {j})"
        for (u, n, e, j) in _realestate_raw_rows()
    )
    # mirrors the reference's ordered-dict per-entity dedup + 1-based
    # doc_index renumbering (realestate_index_scraper.py:427,474-484)
    return f"""
WITH raw(url, search_name, entity_index, raw_order) AS (VALUES
{vals}
), firsts AS (
  SELECT search_name, entity_index, url, MIN(raw_order) AS first_order
  FROM raw GROUP BY 1, 2, 3
)
SELECT url, '' AS status, search_name, entity_index,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY search_name, entity_index ORDER BY first_order)
           AS INT) AS doc_index
FROM firsts
"""


def _q_realestate_frontier(spark, sf):
    """S1 seed-form schema + the real-estate entity frontier shape
    (url, status, search_name, entity_index, doc_index) with keep-first
    per-entity dedup (realestate_index_scraper.py:422-490). Full value
    oracle: the raw per-entity link stream is embedded as a VALUES literal
    and the keep-first dedup + doc_index renumbering are recomputed in SQL;
    schema/order parity vs the simulator is asserted in
    tests/test_seedforms.py."""
    from gsccca_tax_records_scraper_spark.sources import seedforms

    return seedforms.realestate_entity_frontier(spark, _REALESTATE_FORMS).orderBy(
        "search_name", "entity_index", "doc_index"
    )


_REGISTRY["realestate_entity_frontier"] = (_q_realestate_frontier, _realestate_frontier_sql())


# ---- OCR-extraction cascades over synthetic doc text (F5/F6/A2) ------------
# Text is constructed identically on both sides from integer columns only
# (no float formatting), then the real cascade operators run on the Spark
# side and a mechanical SQL transliteration of the same regex vocabulary runs
# on the DuckDB side.

_NORM_SP = "trim(regexp_replace({0}, '[ \\t]+', ' ', 'g'))"


def _sql_first_date(e: str) -> str:
    from gsccca_tax_records_scraper_spark.functions.extract import (
        MONTH_DATE_PAT,
        NUMERIC_DATE_PAT,
    )

    m = _NORM_SP.format(f"regexp_extract({e}, '(?i){MONTH_DATE_PAT}', 0)")
    n = _NORM_SP.format(f"regexp_extract({e}, '{NUMERIC_DATE_PAT}', 0)")
    return f"coalesce(nullif({m}, ''), nullif({n}, ''), '')"


_MONEY_TEXT_SQL = (
    "'STATE TAX FIFA ' || o_orderkey || chr(10)"
    " || 'INTEREST ' || (CASE WHEN o_orderkey % 3 = 0 THEN '§' ELSE '$' END)"
    "   || ((o_orderkey * 104729) % 90 + 1) || '.37' || chr(10)"
    " || (CASE WHEN o_orderkey % 5 = 0 THEN 'PAID S' ELSE 'PAID $' END)"
    "   || ((o_orderkey * 31) % 90 + 1) || '.83' || chr(10)"
    " || (CASE WHEN o_orderkey % 7 = 0 THEN 'TOTAL DUE: ' ELSE 'TOTAL DUE: $' END)"
    "   || ((o_orderkey * 7919) % 30000 + 100) || '.61'"
)


def _money_text_col():
    return F.concat(
        F.lit("STATE TAX FIFA "), F.col("o_orderkey").cast("string"), F.lit("\n"),
        F.lit("INTEREST "),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("§")).otherwise(F.lit("$")),
        ((F.col("o_orderkey") * 104729) % 90 + 1).cast("string"), F.lit(".37\n"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("PAID S")).otherwise(F.lit("PAID $")),
        ((F.col("o_orderkey") * 31) % 90 + 1).cast("string"), F.lit(".83\n"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("TOTAL DUE: ")).otherwise(
            F.lit("TOTAL DUE: $")
        ),
        ((F.col("o_orderkey") * 7919) % 30000 + 100).cast("string"), F.lit(".61"),
    )


def _money_scored_topk_sql() -> str:
    from gsccca_tax_records_scraper_spark.functions.extract import SCORE_KEYWORDS

    kw = " + ".join(
        f"(CASE WHEN contains(upper, '{k}') THEN {w} ELSE 0.0 END)"
        for k, w in SCORE_KEYWORDS
    )
    return f"""
WITH docs AS (SELECT o_orderkey AS doc_id, {_MONEY_TEXT_SQL} AS text FROM orders),
lines AS (
  SELECT doc_id, trim(l) AS line, upper(trim(l)) AS upper
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM docs)
  WHERE trim(l) <> ''),
prim AS (
  SELECT doc_id, upper, replace(m, ' ', '') AS raw,
    TRY_CAST(replace(replace(replace(m, ' ', ''), '$', ''), ',', '') AS DOUBLE) AS numeric
  FROM (SELECT doc_id, upper, unnest(regexp_extract_all(
          regexp_replace(regexp_replace(line, '§', '$', 'g'), '\\bS\\s*(\\d)', '$\\1', 'g'),
          '(\\$\\s*[\\d,]+(?:\\.\\d{{1,2}})?)', 1)) AS m
        FROM lines)),
prim_s AS (
  SELECT doc_id, raw, round({kw} + coalesce(numeric / 1000.0, 0.0), 3) AS score,
         numeric FROM prim),
has_big AS (
  SELECT doc_id, max(CASE WHEN numeric >= 100.0 THEN 1 ELSE 0 END) AS big
  FROM prim_s GROUP BY doc_id),
fb AS (
  SELECT l.doc_id, l.upper, unnest(regexp_extract_all(l.line, '([\\d,]+\\.\\d{{2}})', 1)) AS d
  FROM lines l LEFT JOIN has_big h ON l.doc_id = h.doc_id
  WHERE contains(l.upper, 'TOTAL') AND coalesce(h.big, 0) = 0),
fb_s AS (
  SELECT doc_id, max_by(d, TRY_CAST(replace(d, ',', '') AS DOUBLE)) AS raw,
    round({kw} + 5.0 + max(TRY_CAST(replace(d, ',', '') AS DOUBLE)) / 1000.0, 3) AS score
  FROM fb GROUP BY doc_id, upper),
pool AS (
  SELECT doc_id, raw, score FROM prim_s
  UNION ALL SELECT doc_id, raw, score FROM fb_s)
SELECT doc_id, raw, score,
  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, raw) AS rank
FROM pool QUALIFY rank <= 3
"""


@_q("money_scored_topk", None)  # SQL attached below (built from SCORE_KEYWORDS)
def q_money_scored_topk(spark, sf):
    from gsccca_tax_records_scraper_spark.operators import scoring

    docs = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("doc_id"), _money_text_col().alias("text")
    )
    return scoring.money_scored_topk_df(docs, "text", "doc_id", k=3)


_REGISTRY["money_scored_topk"] = (q_money_scored_topk, _money_scored_topk_sql())


_DATE_TEXT_SQL = (
    "CASE o_orderkey % 4"
    " WHEN 0 THEN 'Filed and Recorded Aug ' || (o_orderkey % 28 + 1) || ', '"
    "   || (2000 + o_orderkey % 25) || ' 03:06pm'"
    " WHEN 1 THEN 'Filed & Recorded on the 12th day, ' || (2000 + o_orderkey % 25) || ' misc'"
    " WHEN 2 THEN 'Recorded July ' || (o_orderkey % 28 + 1) || ', '"
    "   || (2000 + o_orderkey % 25) || ' header'"
    " ELSE 'plain header 0' || (o_orderkey % 9 + 1) || '/' || (o_orderkey % 19 + 10)"
    "   || '/' || (2000 + o_orderkey % 25) END"
)
_BODY_TEXT_SQL = (
    "CASE o_orderkey % 3"
    " WHEN 0 THEN 'made this 5th day of June, ' || (2000 + o_orderkey % 25) || ' by the borrower'"
    " WHEN 1 THEN 'dated March ' || (o_orderkey % 28 + 1) || ', ' || (2000 + o_orderkey % 25)"
    " ELSE 'no cue body 12/31/' || (2000 + o_orderkey % 25) END"
)


def _date_text_cols():
    k = F.col("o_orderkey")
    y = (2000 + k % 25).cast("string")
    d = (k % 28 + 1).cast("string")
    header = (
        F.when(k % 4 == 0, F.concat(F.lit("Filed and Recorded Aug "), d, F.lit(", "), y, F.lit(" 03:06pm")))
        .when(k % 4 == 1, F.concat(F.lit("Filed & Recorded on the 12th day, "), y, F.lit(" misc")))
        .when(k % 4 == 2, F.concat(F.lit("Recorded July "), d, F.lit(", "), y, F.lit(" header")))
        .otherwise(
            F.concat(
                F.lit("plain header 0"), (k % 9 + 1).cast("string"), F.lit("/"),
                (k % 19 + 10).cast("string"), F.lit("/"), y,
            )
        )
    )
    body = (
        F.when(k % 3 == 0, F.concat(F.lit("made this 5th day of June, "), y, F.lit(" by the borrower")))
        .when(k % 3 == 1, F.concat(F.lit("dated March "), d, F.lit(", "), y))
        .otherwise(F.concat(F.lit("no cue body 12/31/"), y))
    )
    return header, body


def _date_cascade_sql() -> str:
    from gsccca_tax_records_scraper_spark.functions.extract import (
        FILED_RECORDED_PAT,
        MORTGAGE_DATE_PATS,
    )

    frag = f"regexp_extract(header, '(?i){FILED_RECORDED_PAT}', 0)"
    assign = (
        f"CASE WHEN {frag} <> '' THEN"
        f" coalesce(nullif({_sql_first_date(frag)}, ''), {_NORM_SP.format(frag)})"
        f" ELSE {_sql_first_date('header')} END"
    )
    cues = [f"regexp_extract(body, '(?i){p}', 1)" for p in MORTGAGE_DATE_PATS]
    mort = f"{_sql_first_date('body')}"
    for c in reversed(cues):
        mort = (
            f"CASE WHEN {c} <> '' THEN"
            f" coalesce(nullif({_sql_first_date(c)}, ''), {_NORM_SP.format(c)})"
            f" ELSE {mort} END"
        )
    return (
        f"WITH t AS (SELECT o_orderkey AS doc_id, {_DATE_TEXT_SQL} AS header,"
        f" {_BODY_TEXT_SQL} AS body FROM orders)"
        f" SELECT doc_id, {assign} AS assignment_date, {mort} AS mortgage_date FROM t"
    )


@_q("date_extract_cascade", None)  # SQL attached below
def q_date_cascade(spark, sf):
    from gsccca_tax_records_scraper_spark.functions import extract

    header, body = _date_text_cols()
    t = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("doc_id"), header.alias("header"), body.alias("body")
    )
    return t.select(
        "doc_id",
        extract.assignment_date_col(F.col("header")).alias("assignment_date"),
        extract.mortgage_date_col(F.col("body")).alias("mortgage_date"),
    )


_REGISTRY["date_extract_cascade"] = (q_date_cascade, _date_cascade_sql())


_PARTY_TEXT_SQL = (
    "CASE c_custkey % 4"
    " WHEN 0 THEN 'Borrower: ' || c_name || chr(10)"
    "   || 'in favor of First Bank of Georgia,LLC'"
    " WHEN 1 THEN 'made this 3rd day of May, 2005, ' || c_name"
    "   || ' (\"Borrower\") to Acme Lending (\"Lender\")'"
    " WHEN 2 THEN c_name || ' (\"Borrower\") with Mortgagee: Homestead Savings'"
    " ELSE 'no parties mentioned here' END"
)


def _party_text_col():
    k = F.col("c_custkey")
    return (
        F.when(k % 4 == 0, F.concat(F.lit("Borrower: "), F.col("c_name"), F.lit("\nin favor of First Bank of Georgia,LLC")))
        .when(k % 4 == 1, F.concat(F.lit("made this 3rd day of May, 2005, "), F.col("c_name"), F.lit(' ("Borrower") to Acme Lending ("Lender")')))
        .when(k % 4 == 2, F.concat(F.col("c_name"), F.lit(' ("Borrower") with Mortgagee: Homestead Savings')))
        .otherwise(F.lit("no parties mentioned here"))
    )


def _name_cascade_sql() -> str:
    from gsccca_tax_records_scraper_spark.functions.extract import LENDER_PATS, NAME_PATS

    def clean_name(e: str) -> str:
        inner = _NORM_SP.format(f"regexp_extract({e}, '^([^\"()' || chr(10) || chr(13) || ']*)', 1)")
        return f"substring({inner}, 1, 120)"

    def clean_lender(e: str) -> str:
        inner = _NORM_SP.format(f"regexp_extract({e}, '^([^.' || chr(10) || chr(13) || ']*)', 1)")
        return f"substring({inner}, 1, 140)"

    # cascade semantics: first MATCHING pattern wins even if its cleaned
    # capture is empty (mirrors extract._priority_pick_col / the reference)
    name_fb = (
        "substring(" + _NORM_SP.format(
            "regexp_extract(body, '(?i)\\bBorrower(?:s)?\\b.{0,60}', 0)"
        ) + ", 1, 120)"
    )
    lender_fb = (
        "substring(" + _NORM_SP.format(
            "regexp_extract(body,"
            " '(?i)([A-Z][A-Za-z0-9&\\-,\\. ]{3,120})\\s*\\(\\s*Lender\\s*\\)', 1)"
        ) + ", 1, 140)"
    )
    borrower = name_fb
    for p in reversed(NAME_PATS):
        pick = clean_name(f"regexp_extract(body, '(?i){p}', 1)")
        borrower = (
            f"CASE WHEN regexp_matches(body, '(?i){p}') THEN {pick} ELSE {borrower} END"
        )
    lender = lender_fb
    for p in reversed(LENDER_PATS):
        pick = clean_lender(f"regexp_extract(body, '(?i){p}', 1)")
        lender = (
            f"CASE WHEN regexp_matches(body, '(?i){p}') THEN {pick} ELSE {lender} END"
        )
    return (
        f"WITH t AS (SELECT c_custkey AS doc_id, {_PARTY_TEXT_SQL} AS body FROM customer)"
        f" SELECT doc_id, {borrower} AS borrower, {lender} AS lender FROM t"
    )


@_q("name_extract_cascade", None)  # SQL attached below
def q_name_cascade(spark, sf):
    from gsccca_tax_records_scraper_spark.functions import extract

    t = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("doc_id"), _party_text_col().alias("body")
    )
    return t.select(
        "doc_id",
        extract.name_col(F.col("body")).alias("borrower"),
        extract.lender_col(F.col("body")).alias("lender"),
    )


_REGISTRY["name_extract_cascade"] = (q_name_cascade, _name_cascade_sql())


# ---- training-data pipeline: dedup ladder ----------------------------------

@_q(
    "exact_dup_groups",
    "SELECT fp, count(*) AS n_docs, min(doc_id) AS min_doc_id FROM ("
    " SELECT doc_id, md5(text) AS fp FROM documents"
    " UNION ALL SELECT doc_id, md5(text) AS fp FROM documents)"
    " GROUP BY fp HAVING count(*) > 1",
)
def q_exact_dup(spark, sf):
    d = _t(spark, sf, "documents")
    return textdedup.exact_duplicates(d.unionByName(d))


@_q(
    "ngram_overlap_pairs",
    # the df window (2 <= df <= 64) mirrors the engine's frequency pruning
    # exactly: the max_df stop-shingle cut changes n_common for mixed pairs,
    # so the oracle must apply the same window (textdedup.ngram_overlap_pairs)
    "WITH ex AS (SELECT doc_id, unnest(" + _SHINGLES_SQL + ") AS sh FROM documents),"
    " keep AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) BETWEEN 2 AND 64),"
    " exk AS (SELECT ex.doc_id, ex.sh FROM ex JOIN keep USING (sh))"
    " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common"
    " FROM exk a JOIN exk b ON a.sh = b.sh AND a.doc_id < b.doc_id"
    " GROUP BY 1, 2 HAVING count(*) >= 5",
)
def q_ngram_pairs(spark, sf):
    return textdedup.ngram_overlap_pairs(_t(spark, sf, "documents"), min_common=5)


# winnowing (SIGMOD'03 / MOSS) copy-detection pairs under a FULL value
# oracle: DuckDB recomputes the exact polynomial k-gram hashes (kernel
# literals derived from the operator's own BASE/MOD so there is one source
# of truth), selects the rightmost-minimal hash per w-window via a
# composite min (h * 2^31 + (M - pos): minimizing it minimizes h then
# maximizes pos — the numpy reversed-argmin tie rule), handles the
# short-doc single-global-min case, and applies the SAME df window + pair
# tail as the engine's shared df_window_pairs.
_WINNOW_K, _WINNOW_W = 8, 16


def _winnow_kernel() -> list[int]:
    kern, p = [0] * _WINNOW_K, 1
    for j in range(_WINNOW_K - 1, -1, -1):
        kern[j] = p
        p = (p * winnow.BASE) % winnow.MOD
    return kern


_WINNOW_TERMS_SQL = " + ".join(
    f"unicode(substr(text, i + {j}, 1))::BIGINT * {kj}"
    for j, kj in enumerate(_winnow_kernel())
)
_WINNOW_SQL = (
    "WITH posn AS (SELECT doc_id, text,"
    f" unnest(generate_series(1, greatest(length(text) - {_WINNOW_K - 1}, 0))) AS i"
    " FROM documents),"
    f" grams AS (SELECT doc_id, i - 1 AS pos, ({_WINNOW_TERMS_SQL}) % {winnow.MOD} AS h"
    " FROM posn),"
    " hcount AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),"
    f" comp AS (SELECT doc_id, pos, h * {1 << 31} + ({winnow.MOD} - pos) AS c FROM grams),"
    " wmins AS (SELECT doc_id, pos, min(c) OVER (PARTITION BY doc_id ORDER BY pos"
    f" ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS wc FROM comp),"
    " sel AS (SELECT DISTINCT w.doc_id, wc FROM wmins w JOIN hcount USING (doc_id)"
    f" WHERE n >= {_WINNOW_W} AND pos <= n - {_WINNOW_W}"
    " UNION ALL SELECT c.doc_id, min(c) AS wc FROM comp c JOIN hcount USING (doc_id)"
    f" WHERE n < {_WINNOW_W} GROUP BY c.doc_id),"
    f" fps AS (SELECT DISTINCT doc_id, wc // {1 << 31} AS fp FROM sel),"
    " keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 64),"
    " fk AS (SELECT fps.doc_id, fps.fp FROM fps JOIN keep USING (fp))"
    " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common"
    " FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id"
    " GROUP BY 1, 2 HAVING count(*) >= 2"
)


@_q("winnow_overlap_pairs", _WINNOW_SQL)
def q_winnow_pairs(spark, sf):
    return winnow.winnow_overlap_pairs(
        _t(spark, sf, "documents"), min_common=2, k=_WINNOW_K, w=_WINNOW_W, max_df=64
    )


# the minhash CTE list + pair select are shared by minhash_lsh_pairs and
# dup_clusters (the clusters query runs connected components over exactly
# this pair graph, so its oracle must rebuild the same edges)
_MINHASH_CTES = (
    "ex AS (SELECT doc_id, unnest(" + _SHINGLES_SQL + ") AS sh FROM documents),"
    " sig AS (SELECT doc_id, band, min(md5(sh || '#' || band)) AS minhash"
    "   FROM ex, (SELECT unnest(generate_series(0, 3)) AS band) GROUP BY doc_id, band)"
)
_MINHASH_PAIRS_SELECT = (
    "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b"
    " ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id"
)


@_q("minhash_lsh_pairs", "WITH " + _MINHASH_CTES + " " + _MINHASH_PAIRS_SELECT)
def q_minhash_pairs(spark, sf):
    sigs = textdedup.minhash_signatures(_t(spark, sf, "documents"), n_bands=4)
    return textdedup.lsh_candidate_pairs(sigs)


@_q(
    "dup_clusters",
    # duplicate-cluster resolution: connected components over the minhash
    # pair graph, cluster_id = component-min doc_id (the canonical keep).
    # The oracle's recursive CTE floods every node's id along the
    # symmetrized edges; min over the flooded labels per node is the
    # component minimum — UNION (set) semantics bounds the recursion.
    "WITH RECURSIVE " + _MINHASH_CTES + ","
    " pairs AS (" + _MINHASH_PAIRS_SELECT + "),"
    " edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs"
    "   UNION SELECT doc_b, doc_a FROM pairs),"
    " reach(node, lbl) AS ("
    "   SELECT u, u FROM edges"
    "   UNION"
    "   SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node),"
    " comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)"
    " SELECT node AS doc_id, cluster_id,"
    " count(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM comp",
)
def q_dup_clusters(spark, sf):
    sigs = textdedup.minhash_signatures(_t(spark, sf, "documents"), n_bands=4)
    pairs = textdedup.lsh_candidate_pairs(sigs)
    return components.dup_clusters(pairs)


@_q(
    "simhash_fingerprints",
    _SIMHASH_CTE + " SELECT doc_id, simhash FROM fp",
)
def q_simhash(spark, sf):
    return textdedup.simhash_fingerprints(_t(spark, sf, "documents"), bits=SIMHASH_BITS)


# simhash near-pairs (pigeonhole banding) keeps pytest coverage: the
# banded pair set is asserted EQUAL to the brute-force all-pairs hamming
# filter in tests/test_components.py, which is strictly stronger than the
# histogram oracle this slot used to carry (displaced by dup_clusters —
# registry stays at the driver's 50-entry window).


# ---- training-data pipeline: similarity search ------------------------------

@_q(
    "cosine_topk_bruteforce",
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5)"
    " SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM ("
    "   SELECT q.query_id, e.vec_id,"
    "     list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[])"
    "       / (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))"
    "          * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos,"
    "     row_number() OVER (PARTITION BY q.query_id ORDER BY cos DESC, e.vec_id) AS rank"
    "   FROM embeddings e CROSS JOIN q) WHERE rank <= 3",
)
def q_cosine_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.brute_force_topk(emb, queries, k=3)


# ANN LSH gets a FULL value oracle (VERDICT r2 #4): the sign-plane family is
# pinned to md5-derived ±1 Rademacher planes, which DuckDB rebuilds
# bit-for-bit, so bucketing + within-bucket exact top-k are value-checked
# end-to-end. (IVF below gets the same treatment with pinned centroids.)

_LSH_DIM, _LSH_PLANES_N = 64, 6


def _lsh_bucket_sql(vec_expr: str) -> str:
    planes = similarity.rademacher_planes(_LSH_DIM, _LSH_PLANES_N)
    terms = []
    for j, p in enumerate(planes):
        lst = "[" + ", ".join(str(int(x)) for x in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}::DOUBLE[], {lst}::DOUBLE[]) > 0"
            f" THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _ann_lsh_sql() -> str:
    cos = (
        "list_dot_product(q.qv::DOUBLE[], b.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))"
        " * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
    )
    return (
        f"WITH b AS (SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket"
        " FROM embeddings),"
        " q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 5)"
        " SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM ("
        f"   SELECT q.query_id, b.vec_id, {cos} AS cos,"
        "     row_number() OVER (PARTITION BY q.query_id ORDER BY cos DESC, b.vec_id)"
        "       AS rank"
        "   FROM b JOIN q ON b.bucket = q.bucket) WHERE rank <= 3"
    )


def _q_lsh_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.lsh_topk(
        emb, queries, k=3, planes=similarity.rademacher_planes(_LSH_DIM, _LSH_PLANES_N)
    )


# IVF oracle: with PINNED md5-derived coarse centroids the whole IVF
# mechanism — argmax-dot cell assignment, top-nprobe probe-cell selection,
# within-cell exact top-k — is SQL-expressible, so the contract entry is
# value-checked end-to-end. The k-means-TRAINED path (the production
# default) stays covered by the clustered-recall>=0.8 tests in
# tests/test_similarity.py (training is iterative, not SQL).

_IVF_CELLS, _IVF_NPROBE = 8, 2


def _ivf_centroids() -> list[list[float]]:
    return similarity.rademacher_planes(_LSH_DIM, _IVF_CELLS)


def _ann_ivf_sql() -> str:
    cents = _ivf_centroids()

    def dots(vec: str) -> str:
        return "[" + ", ".join(
            f"list_dot_product({vec}::DOUBLE[], "
            "[" + ", ".join(str(int(x)) for x in c) + "]::DOUBLE[])"
            for c in cents
        ) + "]"

    # first max wins on ties — same rule as cell_of's strict > comparison
    cell = f"(list_position({dots('embedding')}, list_max({dots('embedding')})) - 1)"
    scored = (
        "list_transform(generate_series(1, " + str(_IVF_CELLS) + "),"
        f" i -> struct_pack(d := {dots('embedding')}[i], cell := i - 1))"
    )
    probe = (
        f"list_transform(list_slice(list_reverse(list_sort({scored})), 1,"
        f" {_IVF_NPROBE}), x -> x.cell)"
    )
    cos = (
        "list_dot_product(q.qv::DOUBLE[], b.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))"
        " * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
    )
    return (
        f"WITH b AS (SELECT vec_id, embedding, {cell} AS cell FROM embeddings),"
        " q AS (SELECT vec_id AS query_id, embedding AS qv, unnest("
        f"{probe}) AS cell FROM embeddings WHERE vec_id < 5)"
        " SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM ("
        f"   SELECT q.query_id, b.vec_id, {cos} AS cos,"
        "     row_number() OVER (PARTITION BY q.query_id ORDER BY cos DESC, b.vec_id)"
        "       AS rank"
        "   FROM b JOIN q ON b.cell = q.cell) WHERE rank <= 3"
    )


def _q_ivf_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivf_topk(
        emb, queries, k=3, n_cells=_IVF_CELLS, nprobe=_IVF_NPROBE,
        centroids=_ivf_centroids(),
    )


_REGISTRY["ann_lsh_topk"] = (_q_lsh_topk, _ann_lsh_sql())
_REGISTRY["ann_ivf_topk"] = (_q_ivf_topk, _ann_ivf_sql())


# Embedding-cosine near-dup PAIRS: the last rung of the dedup ladder
# (exact / ngram / minhash-LSH / simhash are on `documents`; this one is on
# `embeddings`). Banded sign-LSH candidates + exact-cosine verify. The md5-
# Rademacher planes pin the hash family, so the oracle rebuilds bucketing,
# candidate generation (bucket self-join == posting-list expansion+distinct)
# and the cosine verify bit-for-bit.

_NEARDUP_BANDS, _NEARDUP_ROWS, _NEARDUP_TH = 4, 4, 0.35


def _neardup_planes() -> list[list[float]]:
    return similarity.rademacher_planes(_LSH_DIM, _NEARDUP_BANDS * _NEARDUP_ROWS)


def _cosine_neardup_sql() -> str:
    planes = _neardup_planes()

    def bucket_expr(b: int) -> str:
        terms = []
        for j in range(_NEARDUP_ROWS):
            lst = "[" + ", ".join(str(int(x)) for x in planes[b * _NEARDUP_ROWS + j]) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lst}::DOUBLE[]) > 0"
                f" THEN {1 << j} ELSE 0 END)"
            )
        return "(" + " + ".join(terms) + ")"

    wide = ", ".join(f"{bucket_expr(b)} AS bk{b}" for b in range(_NEARDUP_BANDS))
    unnest = ", ".join(
        f"struct_pack(band := {b}, bucket := bk{b})" for b in range(_NEARDUP_BANDS)
    )
    cos = (
        "list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[])))"
    )
    return (
        f"WITH w AS (SELECT vec_id, embedding, {wide} FROM embeddings),"
        f" s AS (SELECT vec_id, unnest([{unnest}], recursive := true) FROM w),"
        " p AS (SELECT DISTINCT a.vec_id AS a_id, c.vec_id AS b_id FROM s a"
        "   JOIN s c ON a.band = c.band AND a.bucket = c.bucket"
        "   AND a.vec_id < c.vec_id)"
        " SELECT a_id, b_id, round(cos, 6) AS cos FROM ("
        f"   SELECT p.a_id, p.b_id, {cos} AS cos FROM p"
        "    JOIN embeddings ea ON ea.vec_id = p.a_id"
        "    JOIN embeddings eb ON eb.vec_id = p.b_id)"
        f" WHERE cos >= {_NEARDUP_TH}"
    )


def _q_cosine_neardup(spark, sf):
    emb = _t(spark, sf, "embeddings")
    return similarity.cosine_neardup_pairs(
        emb,
        threshold=_NEARDUP_TH,
        n_bands=_NEARDUP_BANDS,
        rows_per_band=_NEARDUP_ROWS,
        planes=_neardup_planes(),
    )


_REGISTRY["cosine_neardup_pairs"] = (_q_cosine_neardup, _cosine_neardup_sql())


# ---- training-data pipeline: text analysis ----------------------------------

@_q(
    "token_counts",
    "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,"
    f" len(regexp_extract_all(text, '{BPE_TOKEN_PATTERN}')) AS bpe_tokens FROM documents",
)
def q_token_counts(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        textstats.ws_token_count(F.col("text")).alias("ws_tokens"),
        textstats.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


@_q(
    "langid_heuristic",
    "SELECT doc_id, CASE"
    f" WHEN len(regexp_extract_all(text, '{CJK_PATTERN}')) > 0 THEN 'zh'"
    f" WHEN {_SW_RATIO_SQL} >= 0.02 THEN 'en' ELSE 'unknown' END AS lang_guess"
    " FROM documents",
)
def q_langid(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", textstats.langid_col(F.col("text")).alias("lang_guess"))


@_q(
    "quality_score",
    f"SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents",
)
def q_quality(spark, sf):
    # spread_scan: the regex/split-heavy score over a single-file table
    # otherwise runs on one task (guide §2.5 input skew; measured the whole
    # query serial on 1 of 32 cores at sf0.1)
    from gsccca_tax_records_scraper_spark.operators.scanspread import spread_scan

    d = spread_scan(_t(spark, sf, "documents"))
    return d.select("doc_id", textstats.quality_score(F.col("text")).alias("quality"))


@_q(
    "doc_fingerprint",
    "SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),"
    " ' ')) AS fp FROM documents",
)
def q_doc_fp(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", textstats.doc_fingerprint(F.col("text")).alias("fp"))


# ---- training-data pipeline: multimodal plumbing ----------------------------

# UNREGISTERED (r4 verdict, next-round item #5): the stub-metadata features
# here are strictly subsumed by media_features_decoded's full-oracle REAL
# decode, so this entry's registry slot was traded to winnow_overlap_pairs —
# the dedup ladder's only member that lacked an oracle row. The function
# stays callable: bench.py keeps it in the headline suite for round-over-
# round per-query continuity (resolved via module attribute, not queries()).
def q_media_features(spark, sf):
    media = multimodal.attach_media(_t(spark, sf, "documents"))
    feats = multimodal.extract_media_features(media)
    return feats.select("doc_id", "media_ref", "n_bytes", "width", "height", "checksum")


# REAL decode with a FULL value oracle: the corpus generator writes genuine
# PPM/BMP/PNG/WAV bytes whose decoded features are closed-form arithmetic on
# md5(text) (constant fill / constant amplitude — see
# multimodal.synthesize_media_corpus), so DuckDB recomputes width / height /
# channels / sample_rate / duration / mean EXACTLY while Spark actually
# parses headers, inflates zlib streams, unfilters scanlines, and walks RIFF
# chunks. Verifies the from-scratch codecs (operators/mediacodec.py) through
# the contract gate, not just pytest.
_MEDIA_DECODED_SQL = (
    "WITH p AS (SELECT doc_id, 'md5:' || md5(text) AS media_ref,"
    " ('0x' || substr(md5(text), 1, 8))::BIGINT AS h8, doc_id % 4 AS fmt"
    " FROM documents),"
    " q AS (SELECT doc_id, media_ref, fmt, 4 + h8 % 29 AS w,"
    " 4 + (h8 >> 8) % 23 AS ht, h8 % 256 AS fill, 16 + 8 * (h8 % 60) AS n,"
    " (h8 % 20001) - 10000 AS amp FROM p)"
    " SELECT doc_id, media_ref,"
    " CASE fmt WHEN 0 THEN 'image/x-portable-pixmap' WHEN 1 THEN 'image/bmp'"
    " WHEN 2 THEN 'image/png' ELSE 'audio/wav' END AS mime,"
    " (CASE WHEN fmt <= 2 THEN w ELSE 0 END)::INT AS width,"
    " (CASE WHEN fmt <= 2 THEN ht ELSE 0 END)::INT AS height,"
    " (CASE WHEN fmt <= 2 THEN 3 ELSE 0 END)::INT AS channels,"
    " (CASE WHEN fmt = 3 THEN 8000 ELSE 0 END)::INT AS sample_rate,"
    " (CASE WHEN fmt = 3 THEN n // 8 ELSE 0 END)::INT AS duration_ms,"
    " CASE WHEN fmt <= 2 THEN fill::DOUBLE ELSE abs(amp) / 32768.0 END"
    " AS mean_value, TRUE AS decoded FROM q"
)


@_q("media_features_decoded", _MEDIA_DECODED_SQL)
def q_media_features_decoded(spark, sf):
    corpus = multimodal.synthesize_media_corpus(_t(spark, sf, "documents"))
    feats = multimodal.extract_media_features_real(corpus)
    return feats.select(
        "doc_id", "media_ref", "mime", "width", "height", "channels",
        "sample_rate", "duration_ms", "mean_value", "decoded",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _REGISTRY.items() if sql is not None}
