"""Epoch crawl driver (SURVEY §3.1 "Spark lifecycle equivalent", T1-T6).

One epoch = one Spark batch job over the frontier:

    pending --politeness grant--> fetch+parse (mapInPandas)
        --> records + interleaved-span documents (append)
        --> outlinks --canonicalize/junk/robots--> dedup vs seen --> frontier'

Epoch 0 is the search phase: seeds -> synthetic SERP pages -> link extraction
-> the initial frontier (reference: get_search_results,
lien_index_scraper.py:362-549). Every epoch commits a checkpoint (frontier /
host_state snapshots + seen_exact / seen_state / records / documents /
metrics deltas — seen_state rows are written only for buckets the epoch
CHANGED and read latest-per-bucket); a killed run resumes from the last
committed epoch and, all
UDFs being deterministic (no wall clock, no unseeded random), continues
bit-identically (north_rule, tested in tests/test_resume.py).

Shuffle budget per epoch (the 100-TB story):
  - grant: 1 shuffle on (host, host_bucket) at full parallelism + 1 tiny
    shuffle on host over <= budget*n_buckets survivor rows (skew-safe).
  - fetch: no shuffle (narrow mapInPandas over granted).
  - dedup: 1 shuffle (the cogroup on host_bucket = url_id hash — balanced,
    no host skew); the bucket's whole seen set rides IN its state row as
    filters + packed sorted key arrays, so no seen-side join or aggregation
    exists. The state input is pruned to the batch's distinct buckets (one
    bounded <= fan-out collect) and unchanged buckets emit no state row, so
    per-epoch Arrow AND parquet state traffic is O(touched buckets), with
    the probe/merge work O(batch).
  - writes are partition-local.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import sitegen
from ..functions import extract, urltools
from ..operators import dedup, politeness
from ..simulator import RobotsRule, default_robots
from ..sources.checkpoint import CheckpointStore

_FETCH_SCHEMA = (
    "url_id long, url string, seed_id long, page int, depth int, link_order int, "
    "doc_id string, county string, instrument string, date_filed string, "
    "book string, page_no string, debtors string, claimants string, "
    "amount string, amount_value double, address string, description string, "
    "pdf_document_url string, media_ref string, cancelled boolean, ocr_text string, "
    "outlink_urls array<string>"
)

_CANDIDATE_COLS = ["url", "seed_id", "page", "link_order", "depth", "parent_url_id"]

# outlinks-per-fetched-page upper bound (sitegen emits 5-10 SERP links and a
# handful of detail links; real deployments size this from their parser).
# Used to bound an epoch's candidate count for the dedup state-prune rule.
_OUTLINKS_BOUND = 16
# prune the dedup state input when bound(candidates) <= this many per bucket
# (beyond that the url-hash bucketing touches every bucket anyway and the
# distinct-bucket pass would be a wasted candidate scan)
_PRUNE_BATCH_PER_BUCKET = 4


def _span(kind: str, text, media_ref, offset: int):
    return F.struct(
        F.lit(kind).alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        F.lit(offset).cast("int").alias("offset"),
    )


def span_col():
    """Interleaved span sequence built JVM-side from the parsed columns —
    mirrors extract.record_spans exactly (tests assert span equality against
    the simulator, which uses the Python version)."""
    empty = F.lit("")
    header = F.concat_ws(
        "|", F.col("county"), F.col("instrument"), F.col("date_filed"),
        F.col("book"), F.col("page_no"),
    )
    parties = F.concat(F.col("debtors"), F.lit("; "), F.col("claimants"))
    # callers select spans only for non-cancelled rows
    return F.array(
        _span("text", header, empty, 0),
        _span("text", F.col("description"), empty, 1),
        _span("text", parties, empty, 2),
        _span("media", empty, F.col("media_ref"), 3),
        _span("text", F.col("ocr_text"), empty, 4),
    )


def _fetch_parse(it):
    """mapInPandas body: synthetic fetch (deterministic page generator keyed
    by url — the sandbox stand-in for the network) + vectorized parse.
    Replaces the reference's goto+parse_lien_data loop
    (lien_index_scraper.py:552-597,600-756)."""
    for pdf in it:
        if pdf.empty:
            continue
        # parse doc_no from the url ONCE per batch; html/ocr/media_ref all
        # key off it (the per-url variants re-split the url per call)
        doc_no = pdf["url"].str.rsplit("id=", n=1).str[-1].astype("int64")
        pages = [sitegen.detail_page_no(n) for n in doc_no.to_numpy()]
        html = pd.Series([p[0] for p in pages], index=pdf.index)
        ocr = pd.Series([p[1] for p in pages], index=pdf.index)
        parsed = extract.parse_detail_frame(
            pd.DataFrame({"url": pdf["url"], "html": html, "ocr_text": ocr})
        )
        out = pd.DataFrame(
            {
                "url_id": pdf["url_id"],
                "url": pdf["url"],
                "seed_id": pdf["seed_id"],
                "page": pdf["page"],
                "depth": pdf["depth"],
                "link_order": pdf["link_order"],
                "doc_id": "doc_" + doc_no.astype(str),
                "media_ref": doc_no.map(sitegen.media_ref),
            }
        )
        for c in (
            "county", "instrument", "date_filed", "book", "page_no", "debtors",
            "claimants", "amount", "amount_value", "address", "description",
            "pdf_document_url", "cancelled",
        ):
            out[c] = parsed[c].values
        out.loc[out["cancelled"], "media_ref"] = ""
        out["ocr_text"] = ocr.where(~out["cancelled"], "")
        # vectorized outlink extraction + canonicalization (one extractall
        # over the Arrow batch); cancelled pages contribute no html, so no
        # links — span assembly happens JVM-side (span_col in this module)
        out["outlink_urls"] = urltools.extract_outlinks_frame(
            pdf["url"], html.where(~out["cancelled"], "")
        )
        yield out


class CrawlEngine:
    """The frontier + scheduler engine. All state lives in the checkpoint
    store; the object itself is stateless between steps (kill-safe)."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str | Path,
        epoch_seconds: float = 400.0,
        robots_rules: dict[str, RobotsRule] | None = None,
        compact_every: int = 8,
        split_threshold: int | None = None,
        state_backend: str = "store",
    ):
        self.spark = spark
        self.store = CheckpointStore(workdir, spark)
        self.epoch_seconds = epoch_seconds
        self.robots_rules = robots_rules if robots_rules is not None else default_robots()
        self.compact_every = compact_every
        # seen-set state backend (operators/dedup.py, operators/segstore.py):
        #   "store"  — segment payloads in write-once content-addressed files
        #              under <workdir>/segments, read/written by the Python
        #              workers through a process-level cache; only metadata
        #              rows ride the plan/checkpoint (the scale default —
        #              state bytes cross no shuffle and no Arrow channel);
        #   "inline" — payloads inline in the seen_state rows
        #              (self-contained parquet; no side files).
        # A workdir remembers its backend in the manifest meta — resuming
        # adopts the committed value, so mixed-schema state is impossible.
        if self.store.last_epoch() is not None:
            state_backend = self.store.meta("state_backend", "inline")
        assert state_backend in ("store", "inline"), state_backend
        self.state_backend = state_backend
        if state_backend == "store":
            wd = self.store.workdir
            self._seg_root = f"{wd}/segments" if isinstance(wd, str) else str(wd / "segments")
        else:
            self._seg_root = None
        # hot-bucket splitting (SURVEY §4.1): when any bucket's seen count
        # exceeds this, the fan-out DOUBLES at that epoch's commit (state
        # rows split locally, frontier re-bucketed; the committed fan-out
        # rides in the manifest so resume and later epochs agree). None =
        # fixed fan-out.
        self.split_threshold = split_threshold
        self._validate_robots(self.robots_rules)

    def _validate_robots(self, rules: dict[str, RobotsRule]) -> None:
        # livelock guard: budget = floor(min(carry + r*T, r*T + burst)) can
        # never reach 1 when r*T + burst < 1 — the engine would commit empty
        # epochs forever without draining the frontier. Reject up front.
        for host, rule in rules.items():
            if rule.rate_per_sec * self.epoch_seconds + rule.burst < 1:
                raise ValueError(
                    f"robots rule for {host!r}: rate_per_sec*epoch_seconds + burst"
                    f" = {rule.rate_per_sec * self.epoch_seconds + rule.burst:.3f} < 1;"
                    " the token budget floors to 0 forever (raise burst,"
                    " rate, or epoch_seconds)"
                )

    def update_robots(self, rules: dict[str, RobotsRule]) -> None:
        """Mid-crawl robots/politeness refresh (r4 verdict, missing #5):
        the admission disallow gate and the per-host rate/burst budgets
        are both built from `robots_df()`, which is rebuilt from these
        rules EVERY step — so an update takes effect at the next epoch
        boundary with no state migration. Already-admitted frontier rows
        are NOT retroactively dropped (they passed the gate in force when
        discovered; the reference's fixed-rules behavior) — a caller
        tightening rules who also wants committed URLs gone uses
        `revoke`, the existing removal mechanism. Rules are an ENGINE
        INPUT, not checkpoint state: like a production crawler re-reading
        robots.txt, the caller supplies current rules on resume. The
        constructor's livelock guard applies."""
        self._validate_robots(rules)
        self.robots_rules = rules

    # ----------------------------------------------------------- inputs
    def robots_df(self) -> DataFrame:
        rows = [
            (h, list(r.disallow_prefixes), r.rate_per_sec, r.burst)
            for h, r in sorted(self.robots_rules.items())
        ]
        return self.spark.createDataFrame(
            rows, "host string, disallow_prefixes array<string>, rate_per_sec double, burst int"
        )

    @staticmethod
    def _latest_state_rows(df: DataFrame) -> DataFrame:
        """A bucket's LIVE segment rows from a union of state deltas:
        (1) latest row per (bucket, seg) — revocation/split supersede in
        place (at most one row per seg per epoch, so desc-epoch order is
        deterministic); (2) drop segments covered by a newer row's
        [lo, seg) interval — an epoch's new run records which older
        segments it absorbed. Coverage is transitive (an absorbed row's
        keys live on inside its absorber), so a running min of `lo` over
        the higher segs decides. Both windows partition by host_bucket and
        sort desc(seg), so Catalyst plans ONE exchange + one sort."""
        from pyspark.sql import Window

        w = Window.partitionBy("host_bucket").orderBy(
            F.desc("seg"), F.desc("epoch")
        )
        latest = (
            df.withColumn("__prev", F.lag("seg").over(w))
            .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("seg")))
            .drop("__prev")
        )
        w2 = (
            Window.partitionBy("host_bucket")
            .orderBy(F.desc("seg"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            latest.withColumn("__mlo", F.min("lo").over(w2))
            .filter(F.col("__mlo").isNull() | (F.col("__mlo") > F.col("seg")))
            .drop("__mlo")
        )

    def _read_seen_state(self, upto_epoch: int) -> DataFrame | None:
        """seen_state is a row-superseding delta table: union the deltas and
        keep the LATEST row per bucket (each epoch writes only the buckets
        it changed — per-epoch state I/O scales with the touched set)."""
        df = self.store.read_deltas(self.spark, "seen_state", upto_epoch)
        return None if df is None else self._latest_state_rows(df)

    def _n_buckets(self) -> int:
        """The COMMITTED host-bucket fan-out (manifest meta; splits take
        effect at their epoch's commit)."""
        return int(self.store.meta("n_buckets", urltools.N_HOST_BUCKETS))

    def _current_fanout(self) -> int:
        """The fan-out the in-flight commit will establish: a split staged
        THIS epoch (set_meta, not yet committed) or the committed value."""
        staged = getattr(self.store, "_pending_meta", {}).get("n_buckets")
        return int(staged) if staged is not None else self._n_buckets()

    # ------------------------------------------------- candidate plumbing
    def _finalize_candidates(self, df: DataFrame, epoch: int) -> DataFrame:
        """Raw (url, seed_id, page, link_order, depth, parent_url_id) rows ->
        FRONTIER-shaped rows: junk filter (P2), canonical ids/host JVM-side."""
        url_id = urltools.url_id_col(F.col("url"))
        host = F.lower(F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1))
        return (
            df.filter(~F.lower(F.col("url")).contains("maxrows"))
            .withColumn("url_id", url_id)
            .withColumn("host", host)
            .withColumn(
                "host_bucket",
                urltools.host_bucket_col(F.col("url_id"), self._n_buckets()),
            )
            .withColumn("priority", F.col("depth").cast("double"))
            .withColumn(
                "crawl_order",
                F.struct(
                    F.col("seed_id").cast("long").alias("seed_id"),
                    F.col("page").cast("int").alias("page"),
                    F.col("link_order").cast("int").alias("link_order"),
                    F.col("depth").cast("int").alias("depth"),
                ),
            )
            .withColumn("status", F.lit(""))
            .withColumn(
                "lineage",
                F.struct(
                    F.col("parent_url_id").cast("long").alias("parent_url_id"),
                    F.col("seed_id").cast("long").alias("seed_id"),
                    F.col("depth").cast("int").alias("depth"),
                    F.lit(epoch).cast("int").alias("discovered_epoch"),
                ),
            )
            .select(
                "url_id", "url", "host", "host_bucket", "priority",
                "crawl_order", "status", "lineage",
            )
        )

    def _admit(
        self, raw_candidates: DataFrame, epoch: int, n_cand_bound: int | None = None
    ) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
        """Junk filter + robots gate + dedup; returns (new_rows, seen_state',
        persisted handles to unpersist after the epoch's writes commit).
        The seen_state snapshot carries the whole seen set (filters + packed
        exact keys per bucket), so the hot path reads ONE snapshot — the
        seen_exact delta table is write-only here (export/lineage).

        `n_cand_bound` is the caller's upper bound on the candidate count
        (granted pages x outlinks-per-page): when the batch is small
        relative to the fan-out, dedup prunes its state input to the
        touched buckets (worth one extra candidate scan); a batch >> fan-out
        touches every bucket anyway, so pruning is skipped."""
        robots = self.robots_df()
        cands = self._finalize_candidates(raw_candidates, epoch)
        gated = politeness.apply_robots_gate(cands, robots)
        prev = self.store.last_epoch()
        seen_state = self._read_seen_state(prev) if prev is not None else None
        prune = (
            n_cand_bound is not None
            and n_cand_bound <= _PRUNE_BATCH_PER_BUCKET * self._n_buckets()
        )
        new_rows, state, handles = dedup.dedup_candidates(
            gated, seen_state, epoch, prune_state=prune, store_root=self._seg_root
        )
        return new_rows, state, handles

    def _maybe_split(
        self, seen_state: DataFrame, frontier: DataFrame, epoch: int
    ) -> tuple[DataFrame, DataFrame, int | None]:
        """Double the bucket fan-out when any bucket's seen count crosses
        split_threshold. State rows split locally from the key arrays they
        carry; the frontier is re-bucketed JVM-side (a pure column rewrite).
        Returns (state', frontier', n_new | None). The new fan-out is staged
        as manifest meta and becomes visible at this epoch's commit — a
        crash before commit leaves the old fan-out and old snapshots, so
        resume stays consistent. This epoch's seen_exact/metrics deltas keep
        the PRE-split bucket labels (per-epoch lineage is labeled by the
        bucketing that produced it)."""
        if not self.split_threshold:
            return seen_state, frontier, None
        n_old = self._n_buckets()
        # two triggers (SURVEY §4.1): a bucket's SEEN state outgrowing its
        # shard, or one host's PENDING backlog exceeding threshold-per-bucket
        # (the hot-host case — more buckets directly widens the politeness
        # tournament's parallel phase-1)
        # a bucket's seen count = sum over its live segment rows
        mx_seen = (
            seen_state.groupBy("host_bucket")
            .agg(F.sum("n_items").alias("s"))
            .agg(F.max("s").alias("m"))
            .first()["m"]
        )
        mx_pend = (
            frontier.groupBy("host").count().agg(F.max("count").alias("m")).first()["m"]
        )
        if (mx_seen is None or int(mx_seen) <= self.split_threshold) and (
            mx_pend is None or int(mx_pend) <= self.split_threshold * n_old
        ):
            return seen_state, frontier, None
        n_new = n_old * 2
        # stamp every split row with the current epoch: a split rewrites ALL
        # buckets, and the delta write keeps only rows stamped this epoch
        state2 = dedup.split_seen_state(
            seen_state, n_old, n_new, store_root=self._seg_root
        ).withColumn("epoch", F.lit(epoch).cast("int"))
        frontier2 = frontier.withColumn(
            "host_bucket", urltools.host_bucket_col(F.col("url_id"), n_new)
        )
        self.store.set_meta("n_buckets", n_new)
        return state2, frontier2, n_new

    def _write_epoch(
        self,
        epoch: int,
        frontier: DataFrame,
        seen_state: DataFrame,
        host_state: DataFrame,
        new_rows: DataFrame,
        records: DataFrame | None,
        documents: DataFrame | None,
        metric_counts: dict[str, int],
        bucket_counts: dict[int, int] | None = None,
    ) -> None:
        st = self.store
        st.write("frontier", epoch, frontier.repartition(8, "host_bucket"))
        # delta write: only the bucket rows this epoch changed (stamped with
        # the current epoch by the dedup cogroup / split)
        st.write("seen_state", epoch, seen_state.filter(F.col("epoch") == epoch))
        st.write("host_state", epoch, host_state)
        st.write(
            "seen_exact",
            epoch,
            new_rows.select("host_bucket", "url_id", "url", F.lit(epoch).alias("epoch")),
        )
        if records is not None:
            st.write("records", epoch, records)
        if documents is not None:
            st.write("documents", epoch, documents)
        mrows = [(epoch, -1, k, int(v)) for k, v in sorted(metric_counts.items())]
        # per-partition lineage/metrics (north_rule): admitted-per-bucket
        if bucket_counts is None:
            bucket_counts = {
                int(r["host_bucket"]): int(r["n"])
                for r in new_rows.groupBy("host_bucket").agg(F.count("*").alias("n")).collect()
            }
        per_bucket = [
            (epoch, b, "admitted", n) for b, n in sorted(bucket_counts.items())
        ]
        st.write(
            "metrics",
            epoch,
            self.spark.createDataFrame(
                (mrows + per_bucket) or [(epoch, -1, "noop", 0)],
                "epoch int, host_bucket int, metric string, value long",
            ),
        )
        # fold the per-epoch seen_exact deltas periodically so resume reads
        # stay O(1) dirs instead of O(epochs); takes effect at this commit.
        # Per-epoch deltas keep the bucket labels of the fan-out that
        # produced them (lineage), but the compacted fold RELABELS to the
        # fan-out being committed, so post-split lineage queries group by
        # the live bucketing instead of a mix of historical ones.
        if epoch > 0 and self.compact_every and epoch % self.compact_every == 0:
            nb = self._current_fanout()
            st.compact_deltas(
                self.spark,
                "seen_exact",
                epoch,
                transform=lambda df: df.withColumn(
                    "host_bucket", urltools.host_bucket_col(F.col("url_id"), nb)
                ),
            )
            # seen_state compaction: live-row filter always (delta-dir
            # count back to O(1)). Folding the LSM stack to one run per
            # bucket is backend-dependent: INLINE state carries payload
            # bytes in the rows, so the compaction parquet rewrite is
            # O(|seen|) regardless and merge_segments rides along free;
            # with the SEGMENT STORE the metadata rewrite is O(live rows)
            # and a payload fold would ADD an O(|seen|) rewrite every
            # cadence — linear amplification the binary-counter merge rule
            # exists to avoid — so store payloads are left to the tier rule
            # (fold_segments() below is the explicit maintenance op).
            st.compact_deltas(
                self.spark,
                "seen_state",
                epoch,
                transform=(
                    self._latest_state_rows
                    if self._seg_root is not None
                    else lambda df: dedup.merge_segments(
                        self._latest_state_rows(df), store_root=None
                    )
                ),
            )
            compacted = True
        else:
            compacted = False
        st.commit(epoch)
        # segment-store GC rides the compaction cadence, AFTER the commit
        # that retired the old metadata: files the committed metadata no
        # longer names (absorbed runs, pre-revocation rewrites, crash
        # orphans) are reclaimed; a crash before this point only delays GC
        if compacted and self._seg_root is not None:
            self._gc_segments()

    def _gc_segments(self) -> int:
        """Reclaim segment files no committed seen_state row references.
        The referenced set is EVERY filename readable under EVERY retained
        manifest — the current one AND the predecessor commit() keeps for
        torn-write fallback — so a reader that falls back (corrupt newest
        manifest on a non-rename store, manual rollback) never dangles on
        a reclaimed payload. Superseded rows count too: still listed means
        still resumable. Files a compaction retires therefore survive one
        extra commit (until the pre-compaction manifest itself is pruned)
        — bounded lag, and crash orphans are reclaimed immediately.
        Bounded driver collect: one string per metadata row, <= fan-out x
        MAX_SEGS per manifest view after a compaction."""
        from ..operators import segstore

        referenced: set[str] = set()
        views = 0
        for m in self.store.manifests():
            epochs = m.get("epochs") or []
            if not epochs:
                continue
            df = self.store.read_deltas(
                self.spark, "seen_state", max(epochs), manifest=m
            )
            if df is None:
                # the manifest names committed epochs but none of the
                # seen_state dirs it points at are readable right now
                # (flaky mount, torn object-store read): the referenced
                # set would be INCOMPLETE, and GC with an incomplete set
                # deletes live payloads — skip this cadence entirely;
                # orphans just wait for the next compaction commit
                return 0
            views += 1
            referenced |= {r[0] for r in df.select("file").distinct().collect()}
        if views == 0:
            # no readable committed view at all (e.g. every retained
            # manifest read failed transiently): never treat that as
            # "nothing is referenced"
            return 0
        return segstore.gc_segments(self._seg_root, referenced)

    # ------------------------------------------------------------ phases
    def _serp_raw_candidates(self, seed_ids: list[int]) -> DataFrame:
        """Search-phase candidate rows: seeds -> synthetic SERP pages ->
        extracted links (reference: get_search_results,
        lien_index_scraper.py:362-549). Used by bootstrap and reseed."""
        seeds = self.spark.createDataFrame([(int(s),) for s in seed_ids], "seed_id long")

        def gen_serp(it):
            for pdf in it:
                rows = []
                for seed_id in pdf["seed_id"]:
                    for page in range(1, sitegen.n_serp_pages(int(seed_id)) + 1):
                        base = sitegen.serp_base_url(int(seed_id), page)
                        html = sitegen.serp_html(int(seed_id), page)
                        for i, raw in enumerate(urltools.extract_raw_hrefs(html)):
                            rows.append(
                                (urltools.canonicalize(base, raw), int(seed_id), page, i, 1, None)
                            )
                yield pd.DataFrame(rows, columns=_CANDIDATE_COLS)

        return seeds.repartition(max(2, min(32, len(seed_ids)))).mapInPandas(
            gen_serp,
            "url string, seed_id long, page int, link_order int, depth int, parent_url_id long",
        )

    def bootstrap(self, seed_ids: list[int]) -> None:
        """Epoch 0: search phase. seeds -> SERP pages -> initial frontier."""
        assert self.store.last_epoch() is None, "workdir already bootstrapped"
        self.store.clean_epoch(0)  # phantom-delta guard (see step())
        # pin the backend in the manifest so resume adopts it (commits with
        # epoch 0)
        self.store.set_meta("state_backend", self.state_backend)
        raw = self._serp_raw_candidates(seed_ids)
        new_rows, state, handles = self._admit(raw, 0)
        new_rows = new_rows.cache()
        n_admitted = new_rows.count()
        empty_host_state = self.spark.createDataFrame(
            [], "host string, tokens double, epoch int"
        )
        state, frontier0, _split = self._maybe_split(state, new_rows, 0)
        self._write_epoch(
            0, frontier0, state, empty_host_state, new_rows, None, None,
            {"admitted": n_admitted, "seeds": len(seed_ids)},
        )
        new_rows.unpersist()
        for h in handles:
            h.unpersist()

    def bootstrap_forms(self, forms: list[dict]) -> list[int]:
        """Epoch 0 from structured seed FORMS (S1): each form (party_type,
        instrument_type, county, search_name, from/to_date, ... — the
        reference's form_data, lien_index_scraper.py:331-354) maps to a
        deterministic seed_id; returns the seed ids used."""
        from ..sources import seedforms

        seed_ids = [seedforms.seed_id_of_form(f) for f in forms]
        self.bootstrap(seed_ids)
        return seed_ids

    def step(self) -> dict | None:
        """Run one drain epoch; returns metric counts, or None when the
        frontier is empty (crawl complete)."""
        prev = self.store.last_epoch()
        assert prev is not None, "bootstrap first"
        epoch = prev + 1
        # drop any table dirs a crashed prior attempt left at this epoch:
        # ops write different table subsets, so parquet overwrite alone
        # cannot clear e.g. an aborted revoke's `revoked` dir before a
        # step commits the same epoch number (phantom-delta guard)
        self.store.clean_epoch(epoch)
        pending = self.store.read_snapshot(self.spark, "frontier", prev)
        if pending.isEmpty():
            return None
        robots = self.robots_df()
        prev_host_state = self.store.read_snapshot(self.spark, "host_state", prev)

        budgets = politeness.compute_budgets(
            pending, robots, prev_host_state if prev > 0 else None, self.epoch_seconds
        )
        granted, host_state_new = politeness.grant(
            pending, budgets, epoch, n_buckets=self._n_buckets()
        )
        granted = granted.cache()
        n_granted = granted.count()
        # carry state for hosts with no pending urls this epoch
        host_state = host_state_new.unionByName(
            prev_host_state.select("host", "tokens", F.lit(epoch).alias("epoch")).join(
                host_state_new.select("host"), "host", "left_anti"
            )
        )
        if n_granted == 0:
            # zero-grant epoch (tokens still fractional): commit the token
            # accrual and carry on — the simulator does the same; returning
            # None here would abandon a non-empty frontier
            granted.unpersist()
            empty_rows = self.spark.createDataFrame([], pending.schema)
            self._write_epoch(
                epoch, pending, self._read_seen_state(prev),
                host_state, empty_rows, None, None,
                {"granted": 0, "new_urls": 0, "cancelled": 0}, bucket_counts={},
            )
            return {"epoch": epoch, "granted": 0, "new_urls": 0, "cancelled": 0}

        fetched = (
            granted.select(
                "url_id", "url",
                F.col("crawl_order.seed_id").alias("seed_id"),
                F.col("crawl_order.page").alias("page"),
                F.col("crawl_order.depth").alias("depth"),
                F.col("crawl_order.link_order").alias("link_order"),
            )
            .mapInPandas(_fetch_parse, _FETCH_SCHEMA)
            .cache()
        )

        records = fetched.select(
            "doc_id", "url_id", "url", "county", "instrument", "date_filed",
            "book", "page_no", "debtors", "claimants", "amount", "amount_value",
            "address", "description", "pdf_document_url", "media_ref", "cancelled",
            F.lit(epoch).cast("int").alias("epoch"),
            F.struct(
                F.col("seed_id"), F.col("page"), F.col("link_order"), F.col("depth")
            ).alias("crawl_order"),
        )
        documents = fetched.filter(~F.col("cancelled")).select(
            "doc_id", "url", span_col().alias("spans")
        )

        children = (
            fetched.filter(~F.col("cancelled"))
            .select(
                "url_id", "seed_id", "page", "depth",
                F.posexplode("outlink_urls").alias("link_order", "url"),
            )
            .select(
                "url",
                "seed_id", "page", "link_order",
                (F.col("depth") + 1).alias("depth"),
                F.col("url_id").alias("parent_url_id"),
            )
        )
        new_rows, seen_state, handles = self._admit(
            children, epoch, n_cand_bound=n_granted * _OUTLINKS_BOUND
        )
        new_rows = new_rows.cache()
        # one action for all admission metrics (total + per-bucket)
        bucket_counts = {
            int(r["host_bucket"]): int(r["n"])
            for r in new_rows.groupBy("host_bucket").agg(F.count("*").alias("n")).collect()
        }
        n_new = sum(bucket_counts.values())

        frontier_next = pending.join(
            granted.select("url_id"), "url_id", "left_anti"
        ).unionByName(new_rows)
        seen_state, frontier_next, _split = self._maybe_split(
            seen_state, frontier_next, epoch
        )

        n_cancelled = int(
            fetched.agg(F.sum(F.col("cancelled").cast("int")).alias("nc")).first()["nc"] or 0
        )
        self._write_epoch(
            epoch, frontier_next, seen_state, host_state, new_rows,
            records, documents,
            {"granted": n_granted, "new_urls": n_new, "cancelled": n_cancelled},
            bucket_counts=bucket_counts,
        )
        granted.unpersist()
        fetched.unpersist()
        new_rows.unpersist()
        # release dedup's internal persists explicitly — never clear the
        # session-wide cache (the caller may have its own frames cached)
        for h in handles:
            h.unpersist()
        return {"epoch": epoch, "granted": n_granted, "new_urls": n_new,
                "cancelled": n_cancelled}

    def revoke(self, urls: list[str]) -> dict:
        """Recrawl revocation (north_star deletion capability; reference
        analog: re-scraping after clearing resume state,
        lien_index_scraper.py:114-128). Commits an epoch that removes `urls`
        from the seen set — cuckoo fingerprint O(1) delete, bloom rebuilt
        from the bucket's remaining keys, packed key arrays pruned — so the
        NEXT discovery of any of them (outlink or reseed) is admitted again.
        Urls never seen are no-ops. The revocation is lineage-tracked in the
        `revoked` delta table (a seen_exact rebuild = seen_exact minus
        revoked, last-wins by epoch)."""
        prev = self.store.last_epoch()
        assert prev is not None, "bootstrap first"
        epoch = prev + 1
        self.store.clean_epoch(epoch)  # phantom-delta guard (see step())
        seen_state = self._read_seen_state(prev)
        assert seen_state is not None
        n_b = self._n_buckets()
        # list for convenience; a DataFrame with a `url` column for scale
        # (a 10^8-url revocation should not ride through the driver)
        rev = (
            urls
            if isinstance(urls, DataFrame)
            else self.spark.createDataFrame([(u,) for u in urls], "url string")
        )
        uid = urltools.url_id_col(F.col("url"))
        n_requested = len(urls) if not isinstance(urls, DataFrame) else int(rev.count())
        rev = rev.select(
            "url",
            uid.alias("url_id"),
            urltools.host_bucket_col(uid, n_b).alias("host_bucket"),
            F.xxhash64("url").alias("url_h"),
        )
        snapshot, handles = dedup.revoke_seen(
            seen_state, rev, epoch, store_root=self._seg_root
        )
        delta = snapshot.filter(F.col("epoch") == epoch)
        # actually-removed count: bounded aggs over the replaced SEGMENT
        # rows (per-(bucket,seg) supersession — untouched segments of a
        # touched bucket don't enter either sum)
        changed_pairs = [
            (int(r[0]), int(r[1]))
            for r in delta.select("host_bucket", "seg").collect()
        ]
        pairs_df = self.spark.createDataFrame(
            changed_pairs or [(-1, -1)], "host_bucket int, seg int"
        )
        before = seen_state.join(
            F.broadcast(pairs_df), ["host_bucket", "seg"], "left_semi"
        ).agg(F.sum("n_items")).first()[0] or 0
        after = delta.agg(F.sum("n_items")).first()[0] or 0
        n_removed = int(before) - int(after)

        st = self.store
        pending = st.read_snapshot(self.spark, "frontier", prev)
        host_state = st.read_snapshot(self.spark, "host_state", prev).select(
            "host", "tokens", F.lit(epoch).cast("int").alias("epoch")
        )
        st.write(
            "revoked",
            epoch,
            rev.select("host_bucket", "url_id", "url", F.lit(epoch).alias("epoch")),
        )
        empty_rows = self.spark.createDataFrame([], pending.schema)
        self._write_epoch(
            epoch, pending, snapshot, host_state, empty_rows, None, None,
            {"revoked_requested": n_requested, "revoked_removed": n_removed},
            bucket_counts={},
        )
        for h in handles:
            h.unpersist()
        return {"epoch": epoch, "revoked": n_removed}

    def reseed(self, seed_ids: list[int]) -> dict:
        """Re-run the search phase against the CURRENT crawl state: SERP
        candidates are deduped against the live seen set, so only urls never
        seen — or explicitly revoked since — are admitted to the frontier
        (reference analog: re-running the scraper after clearing resume
        state). Returns admission counts; follow with step()/run() to drain."""
        prev = self.store.last_epoch()
        assert prev is not None, "bootstrap first"
        epoch = prev + 1
        self.store.clean_epoch(epoch)  # phantom-delta guard (see step())
        raw = self._serp_raw_candidates(seed_ids)
        # SERP fan-out bound: <= 3 pages x <= 10 links per seed (sitegen)
        new_rows, state, handles = self._admit(
            raw, epoch, n_cand_bound=len(seed_ids) * 30
        )
        new_rows = new_rows.cache()
        bucket_counts = {
            int(r["host_bucket"]): int(r["n"])
            for r in new_rows.groupBy("host_bucket").agg(F.count("*").alias("n")).collect()
        }
        n_new = sum(bucket_counts.values())
        st = self.store
        frontier = st.read_snapshot(self.spark, "frontier", prev).unionByName(new_rows)
        host_state = st.read_snapshot(self.spark, "host_state", prev).select(
            "host", "tokens", F.lit(epoch).cast("int").alias("epoch")
        )
        state, frontier, _split = self._maybe_split(state, frontier, epoch)
        self._write_epoch(
            epoch, frontier, state, host_state, new_rows, None, None,
            {"reseeded": len(seed_ids), "new_urls": n_new},
            bucket_counts=bucket_counts,
        )
        new_rows.unpersist()
        for h in handles:
            h.unpersist()
        return {"epoch": epoch, "new_urls": n_new}

    def fold_segments(self) -> dict:
        """Explicit LSM maintenance (major compaction): fold each bucket's
        live segment stack to ONE run, resetting the probe/read-
        amplification floor to a single segment per bucket — run it before
        an export or a long read-heavy phase, like a manual VACUUM.
        Deliberately NOT on the compaction cadence: a periodic payload
        fold would re-add the linear write amplification the binary-
        counter tier rule exists to avoid (operators/dedup.py
        tier_absorb). Commits a normal epoch (resume-safe, lineage-
        metered); retired payload files become orphans the next
        compaction-cadence GC reclaims."""
        prev = self.store.last_epoch()
        assert prev is not None, "bootstrap first"
        epoch = prev + 1
        self.store.clean_epoch(epoch)  # phantom-delta guard (see step())
        seen_state = self._read_seen_state(prev)
        assert seen_state is not None
        live = self._latest_state_rows(seen_state)
        segs_before = int(live.count())
        # restamp to the folding epoch so the delta write (filter
        # epoch == current) captures every folded row; the fold row's
        # lo=0 interval supersedes the bucket's whole prior stack on read
        folded = dedup.merge_segments(live, store_root=self._seg_root).withColumn(
            "epoch", F.lit(epoch).cast("int")
        )
        st = self.store
        frontier = st.read_snapshot(self.spark, "frontier", prev)
        host_state = st.read_snapshot(self.spark, "host_state", prev).select(
            "host", "tokens", F.lit(epoch).cast("int").alias("epoch")
        )
        empty_rows = self.spark.createDataFrame([], frontier.schema)
        self._write_epoch(
            epoch, frontier, folded, host_state, empty_rows, None, None,
            {"fold_segments_before": segs_before},
            bucket_counts={},
        )
        segs_after = int(
            self._latest_state_rows(self._read_seen_state(epoch)).count()
        )
        return {"epoch": epoch, "segments_before": segs_before,
                "segments_after": segs_after}

    def run(self, seed_ids: list[int] | None = None, max_epochs: int = 1000) -> int:
        """Bootstrap (if needed) + drain; returns the number of drain epochs
        executed by THIS invocation (0 when resuming a drained crawl).
        max_epochs bounds this invocation, not the absolute epoch number."""
        if self.store.last_epoch() is None:
            assert seed_ids is not None
            self.bootstrap(seed_ids)
        n = 0
        while n < max_epochs:
            if self.step() is None:
                break
            n += 1
        return n

    # ----------------------------------------------------------- outputs
    def records(self) -> DataFrame | None:
        return self.store.read_deltas(self.spark, "records", self.store.last_epoch() or 0)

    def documents(self) -> DataFrame | None:
        return self.store.read_deltas(self.spark, "documents", self.store.last_epoch() or 0)

    def seen(self) -> DataFrame | None:
        return self.store.read_deltas(self.spark, "seen_exact", self.store.last_epoch() or 0)

    def metrics(self) -> DataFrame | None:
        return self.store.read_deltas(self.spark, "metrics", self.store.last_epoch() or 0)

    def revoked(self) -> DataFrame | None:
        """Lineage of revoked urls (None when nothing was ever revoked);
        a seen_exact disaster rebuild = seen_exact minus revoked, last
        stamp wins."""
        return self.store.read_deltas(self.spark, "revoked", self.store.last_epoch() or 0)
