"""End-to-end crawl curation: the single entry point that composes the
round-6 web stack into the pipeline a pretraining-data team actually
runs over a crawl dump.

    WARC files
      → record parse + HTML→text distillation   (sources/warc.py)
      → URL frontier dedup                       (functions/weburl.py)
      → domain boilerplate removal               (operators/boilerplate.py)
      → quality cuts: compression ratio + length (functions/weburl.py)
      → exact + MinHash near dedup against the
        persisted index, atomic corpus publish   (streaming/ingest.py)

Each stage is the already-tested operator — this module only wires
them, so the composition inherits every stage's oracle. Batch form
(``curate_crawl``) for a one-shot dump; the streaming form is the same
sink behind ``open_warc_documents_stream`` (see
tests/test_warc_source.py) with these transforms applied per
micro-batch.

100 TB shape: stages 1-4 are a single lazy plan over the crawl bytes
(no intermediate materialization — Catalyst fuses the projections and
filters between the Arrow boundaries); stage 5 touches the compact
signature index, never historic text. The whole path is
corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.weburl import dedup_by_url, quality_compression_flags
from ..operators.boilerplate import (
    BOILERPLATE_FRAC,
    MIN_GROUP_DOCS,
    frequent_from_stats,
    line_stats,
    remove_boilerplate,
    strip_lines,
)
from ..sources.warc import (
    read_warc,
    warc_to_documents,
    warc_to_office_documents,
    warc_to_pdf_documents,
)
from ..streaming.ingest import CorpusIngestSink
from ..warehouse.persist import ConcurrentWriteError, GoldStore

#: post-curation length floor (chars) — sub-threshold pages are menu
#: fragments once boilerplate is gone
MIN_CHARS = 80


def _with_domain(docs: DataFrame) -> DataFrame:
    """Boilerplate groups by SITE (url host), not per-page url."""
    return docs.withColumn("_domain", F.parse_url("source", F.lit("HOST")))


def _finish_curation(docs: DataFrame, clean: DataFrame) -> DataFrame:
    """Join curated text back onto the doc frame and apply the
    post-boilerplate cuts (length floor, compression window) — the
    shared tail of every curation path, so batch, streaming and repair
    cannot drift."""
    curated = (
        docs.drop("n_chars", "_domain")
        .join(clean.select("doc_id", "_clean"), "doc_id")
        .withColumn("text", F.col("_clean"))
        .drop("_clean")
        .withColumn("n_chars", F.length("text").cast("long"))
        .filter(F.col("n_chars") >= MIN_CHARS)
    )
    flagged = quality_compression_flags(curated)
    return flagged.filter(F.col("keep_compression")).drop("keep_compression")


def curate_documents(docs: DataFrame) -> DataFrame:
    """Document-level curation (URL frontier dedup → per-site
    boilerplate strip → length + compression cuts) over any frame in
    the documents shape with line-preserving text. Boilerplate
    frequency is measured within ``docs`` (the one-shot batch form);
    the streaming sink swaps in the cumulative persisted evidence."""
    docs = _with_domain(dedup_by_url(docs, url_col="source", id_col="doc_id"))
    clean = remove_boilerplate(docs, group_col="_domain").withColumnRenamed(
        "text", "_clean"
    )
    return _finish_curation(docs, clean)


def distill_and_curate(spark: SparkSession, warc_path: str) -> DataFrame:
    """Stages 1-4 as one lazy frame: curated candidate documents
    (doc_id, text, lang, source, n_chars, compression_ratio) — content
    dedup (stage 5) happens at publish so it can run against the
    persisted index."""
    return distill_frame(read_warc(spark, warc_path))


def distill_frame(warc: DataFrame) -> DataFrame:
    """The distillation stages over an already-open record frame (batch
    read or a foreachBatch micro-batch)."""
    curated = curate_documents(warc_to_documents(warc, lines=True))
    # PDFs and Office documents join after the HTML-only stages (no
    # site boilerplate to strip; their distillers carry their own
    # quality gates)
    extra = warc_to_pdf_documents(warc).unionByName(
        warc_to_office_documents(warc)
    )
    extra = quality_compression_flags(extra.filter(F.col("n_chars") >= MIN_CHARS))
    return curated.unionByName(
        extra.filter(F.col("keep_compression")).drop("keep_compression")
    )


def curate_crawl(
    spark: SparkSession,
    warc_path: str,
    store: GoldStore,
    k: int | None = None,
) -> int:
    """Run the full pipeline over a crawl dump and publish the novel
    documents + their index rows atomically. Returns the number of
    documents admitted this run (0 for a pure re-crawl). Idempotent:
    re-running over the same dump admits nothing new.

    The admitted count comes FROM the sink (it computes the novel-row
    count anyway for its empty-batch guard) — an O(batch) fact; the
    corpus table is never scanned, so this entry point stays O(crawl
    bytes) at any corpus size."""
    curated = distill_and_curate(spark, warc_path)
    sink = CorpusIngestSink(store, k=k)
    return sink(curated, batch_id=-1)


class CuratedCorpusIngestSink(CorpusIngestSink):
    """Streaming form of the crawl pipeline: each micro-batch of
    distilled documents (``open_warc_documents_stream(..., lines=True)``)
    is CURATED (URL dedup, per-site boilerplate, quality cuts) before
    the inherited dedup-vs-index + atomic-publish loop.

    Boilerplate frequency comes from a PERSISTED per-site
    line-frequency index (``boilerplate_table``): each batch strips
    using the cumulative evidence (stored deltas + this batch), and the
    admitted documents' raw-line stats append atomically with the
    batch — so a site spread one-page-per-batch still converges on its
    template. Pages published before their site crossed the frequency
    threshold keep stale boilerplate until ``repair_boilerplate``
    re-curates them — run automatically whenever the boilerplate index
    compacts (the table-rewrite moment already amortizes an O(corpus)
    pass), or explicitly for an immediate sweep.
    ``frac``/``min_docs`` are the index's data contract — persisted as
    table properties, verified on reopen, explicit conflicts fail fast
    (same discipline as the dedup index's shingle width).

    A persisted URL FRONTIER (``url_table``: xxhash64 digests of the
    canonical URL) drops RE-CRAWLED urls at batch entry — before
    distill-side curation and content hashing spend anything on them:
    the crawl-frontier contract that the same canonical URL is the same
    resource. First-seen URL digests of each batch append atomically
    with the batch (only when something novel publishes — an all-replay
    batch leaves every table untouched, keeping replays version-stable;
    fresh URLs whose content fully dedups are re-examined next crawl,
    the cheap and safe direction)."""

    def __init__(
        self,
        store: GoldStore,
        boilerplate_table: str = "boilerplate_index",
        url_table: str = "url_frontier",
        frac: float | None = None,
        min_docs: int | None = None,
        **kwargs,
    ):
        self.boilerplate_table = boilerplate_table
        self.url_table = url_table
        self._explicit_frac = frac
        self._explicit_min_docs = min_docs
        self.frac = BOILERPLATE_FRAC if frac is None else frac
        self.min_docs = MIN_GROUP_DOCS if min_docs is None else min_docs
        self._fresh_urls: DataFrame | None = None
        super().__init__(store, **kwargs)

    def _bind_contract(self) -> None:
        super()._bind_contract()
        stored = self.store.properties(self.boilerplate_table)
        for key, explicit, cast in (
            ("frac", self._explicit_frac, float),
            ("min_docs", self._explicit_min_docs, int),
        ):
            if key in stored:
                val = cast(stored[key])
                if explicit is not None and cast(explicit) != val:
                    raise ValueError(
                        f"boilerplate index was built with {key}={val}; "
                        f"reopening with {key}={explicit} would change which "
                        "lines count as template — pass None to adopt"
                    )
                setattr(self, key, val)

    def _collapse_batch(self, batch_df: DataFrame) -> DataFrame:
        from ..functions.weburl import canonical_url

        deduped = dedup_by_url(batch_df, url_col="source", id_col="doc_id")
        deduped = deduped.withColumn("_ud", F.xxhash64(canonical_url("source")))
        tables = self.store.current_manifest()["tables"]
        if self.url_table in tables:
            seen = self.store.read(self.url_table).select("url_digest")
            deduped = deduped.join(
                seen.withColumnRenamed("url_digest", "_ud"), "_ud", "left_anti"
            )
        self._fresh_urls = deduped.select(F.col("_ud").alias("url_digest")).distinct()
        docs = _with_domain(deduped.drop("_ud"))
        delta = line_stats(docs, group_col="_domain")
        tables = self.store.current_manifest()["tables"]
        if self.boilerplate_table in tables:
            stats = self.store.read(self.boilerplate_table).unionByName(delta)
        else:
            stats = delta
        frequent = frequent_from_stats(stats, self.frac, self.min_docs)
        clean = strip_lines(docs, frequent, group_col="_domain").withColumnRenamed(
            "text", "_clean"
        )
        # carry the RAW text through dedup: the admitted docs' raw lines
        # are the evidence the persisted index accumulates
        curated = _finish_curation(docs.withColumn("_bp_raw", F.col("text")), clean)
        return super()._collapse_batch(curated)

    def _publish_frame(self, novel: DataFrame) -> DataFrame:
        return novel.drop("_bp_raw")

    def _extra_publish(self, novel: DataFrame) -> tuple[dict, dict]:
        raw = _with_domain(novel.withColumn("text", F.col("_bp_raw")))
        delta = line_stats(raw, group_col="_domain")
        props = {"frac": float(self.frac), "min_docs": int(self.min_docs)}
        frames = {self.boilerplate_table: delta}
        if self._fresh_urls is not None:
            frames[self.url_table] = self._fresh_urls
        return frames, {self.boilerplate_table: props}

    def _maintained_tables(self) -> tuple[str, ...]:
        return (*super()._maintained_tables(), self.boilerplate_table, self.url_table)

    def _compact_table(self, name: str) -> None:
        if name == self.boilerplate_table:
            # fold the counter deltas: SUM per (grp, lh) — equivalent
            # under frequent_from_stats; bounds the table at distinct lines
            folded = (
                self.store.read(name).groupBy("grp", "lh").agg(F.sum("n").alias("n"))
            )
            base = self.store.current_version()
            props = self.store.properties(name)
            self.store.publish(
                {name: folded}, base, properties={name: props} if props else None
            )
            # the documented amortization point: repair already-published
            # docs against the cumulative evidence exactly when we pay a
            # table rewrite anyway (best-effort, CAS-raced like compact)
            try:
                repair_boilerplate(
                    self.store,
                    corpus_table=self.data_table,
                    boilerplate_table=name,
                    frac=self.frac,
                    min_docs=self.min_docs,
                )
            except ConcurrentWriteError:
                pass
            return
        if name == self.url_table:
            # membership set: duplicate digests (from partial-novelty
            # batches re-appending seen URLs) fold to distinct
            folded = self.store.read(name).distinct()
        else:
            return super()._compact_table(name)
        base = self.store.current_version()
        props = self.store.properties(name)
        self.store.publish(
            {name: folded}, base, properties={name: props} if props else None
        )


def repair_boilerplate(
    store: GoldStore,
    corpus_table: str = "corpus",
    boilerplate_table: str = "boilerplate_index",
    frac: float = BOILERPLATE_FRAC,
    min_docs: int = MIN_GROUP_DOCS,
) -> int:
    """Re-curate already-published documents against the CUMULATIVE
    per-site line-frequency index — the maintenance pass that closes
    the streaming gap: a page admitted before its site's template
    crossed the frequency threshold keeps stale boilerplate until this
    sweep strips it (and re-applies the post-strip length/compression
    cuts, removing docs that no longer qualify). O(corpus) by design,
    like ``compact`` — run on the compaction cadence, not per batch.
    Returns the number of documents rewritten or removed (0 = already
    converged, store untouched). Dedup-index signatures keep their
    at-ingest values (they represent the content as first seen —
    re-signing repaired text would let recrawls of the raw page
    re-enter)."""
    tables = store.current_manifest()["tables"]
    if corpus_table not in tables or boilerplate_table not in tables:
        return 0
    last: ConcurrentWriteError | None = None
    for _ in range(5):
        base = store.current_version()
        frequent = frequent_from_stats(
            store.read(boilerplate_table), frac, min_docs
        )
        docs = _with_domain(store.read(corpus_table))
        clean = strip_lines(docs, frequent, group_col="_domain").withColumnRenamed(
            "text", "_clean"
        )
        changed = clean.filter(F.col("n_removed") > 0).count()
        if changed == 0:
            return 0
        rebuilt = _finish_curation(docs, clean)
        try:
            store.publish({corpus_table: rebuilt}, base)
            return changed
        except ConcurrentWriteError as e:
            last = e
    raise last


class HostGraphIngestSink:
    """Persisted host-level link graph from the raw crawl stream — the
    evidence table behind frontier prioritization (``host_rank``).

    Runs beside the document sink over the same WARC record stream
    (``read_warc`` shape): each micro-batch's 200-OK ``text/html``
    responses yield (src_host, dst_host, n_links) edge deltas, appended
    under the usual CAS loop. Deltas are SUM-mergeable, so compaction
    folds the table to one row per host pair (the same counter-index
    shape as the boilerplate evidence); a replayed foreachBatch batch
    double-counts edge weights at worst, which PageRank normalizes away
    per-source — link COUNTS are advisory, the graph topology is what
    ranks. 100 TB shape: per batch it touches batch HTML only; the
    persisted table is bounded by distinct linking host pairs, not by
    crawl bytes."""

    MAX_DIRS = 16
    KEEP_VERSIONS = 4

    def __init__(
        self,
        store: GoldStore,
        table: str = "host_graph",
        max_dirs: int | None = None,
        keep_versions: int | None = None,
    ):
        self.store = store
        self.table = table
        self.max_dirs = self.MAX_DIRS if max_dirs is None else max_dirs
        self.keep_versions = self.KEEP_VERSIONS if keep_versions is None else keep_versions

    def __call__(self, warc_batch: DataFrame, batch_id: int) -> int:
        from ..functions.weburl import extract_links, host_graph

        pages = warc_batch.filter(
            F.col("corrupt_reason").isNull()
            & (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("mime").startswith("text/html")
        ).select(
            F.col("target_uri").alias("url"),
            F.col("payload").cast("string").alias("html"),
        )
        delta = host_graph(extract_links(pages, "html", "url")).cache()
        try:
            n_pairs = delta.count()
            if n_pairs == 0:
                return 0
            last: ConcurrentWriteError | None = None
            for _ in range(5):
                base = self.store.current_version()
                try:
                    self.store.publish_append({self.table: delta}, base)
                    break
                except ConcurrentWriteError as e:
                    last = e
            else:
                raise last
        finally:
            delta.unpersist()
        self._maybe_compact()
        return n_pairs

    def _maybe_compact(self) -> None:
        tables = self.store.current_manifest()["tables"]
        entry = tables.get(self.table)
        if entry and len(self.store._dirs(entry)) > self.max_dirs:
            try:
                folded = (
                    self.store.read(self.table)
                    .groupBy("src_host", "dst_host")
                    .agg(F.sum("n_links").alias("n_links"))
                )
                self.store.publish({self.table: folded}, self.store.current_version())
                self.store.vacuum(keep_versions=self.keep_versions)
            except ConcurrentWriteError:
                pass  # a concurrent writer won; next batch retries


def host_rank_from_store(
    store: GoldStore, table: str = "host_graph", damping: float = 0.85,
    weighted: bool = False,
) -> DataFrame:
    """(host, rank) over the persisted host graph: fold the counter
    deltas, rank the topology. The crawl scheduler joins this against
    candidate frontier URLs (``parse_url(url, 'HOST')``) to order the
    fetch queue. Default unweighted (replay-stable — foreachBatch
    replays can only inflate counts, never add edges);
    ``weighted=True`` uses the accumulated n_links when the ingest
    history is known replay-free."""
    from ..operators.graph import pagerank

    edges = (
        store.read(table)
        .groupBy("src_host", "dst_host")
        .agg(F.sum("n_links").alias("n_links"))
    )
    return pagerank(
        edges, src="src_host", dst="dst_host", damping=damping,
        weight="n_links" if weighted else None,
    ).select(F.col("node").alias("host"), "rank")


def curate_dump(
    spark: SparkSession,
    dump_path: str,
    store: GoldStore,
    k: int | None = None,
    fmt: str = "tar",
) -> int:
    """One-shot dataset-dump ingestion — the archive analog of
    ``curate_crawl``: tar/zip shards → distilled documents → curation →
    dedup-vs-index + atomic publish; returns the admitted count from
    the sink (O(dump bytes), corpus never rescanned; idempotent under
    re-landing the same dump).

    Curation differences from the web path, both deliberate: identity
    dedup keys on the RAW ``archive::member`` provenance string (these
    are not URLs — ``canonical_url`` would collapse them all to one
    empty-authority form — and a dump has no crawl frontier), and
    boilerplate groups by ARCHIVE — the dump analog of per-site (a
    shard family shares its template headers the way a site shares its
    chrome)."""
    from pyspark.sql.window import Window

    from ..sources.archive import read_tar, read_zip, tar_to_documents

    if fmt not in ("tar", "zip"):
        raise ValueError(f"curate_dump: unknown dump format {fmt!r}")
    members = (read_zip if fmt == "zip" else read_tar)(spark, dump_path)
    w = Window.partitionBy("source").orderBy("doc_id")
    docs = (
        tar_to_documents(members, lines=True)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_domain", F.split("source", "::").getItem(0))
    )
    clean = remove_boilerplate(docs, group_col="_domain").withColumnRenamed(
        "text", "_clean"
    )
    curated = _finish_curation(docs, clean)
    sink = CorpusIngestSink(store, k=k)
    return sink(curated, batch_id=-1)


# --------------------------------------------------------------------------
# crawl politeness: persisted robots rules + the scheduler's frontier feed
# --------------------------------------------------------------------------


class RobotsIngestSink:
    """Persisted RFC 9309 rules from the raw crawl stream — the
    politeness evidence behind frontier admission.

    Runs beside the document/host-graph sinks over the same WARC record
    stream: each micro-batch's 200-OK ``*/robots.txt`` responses parse
    into rule rows (functions/robots.py) stamped with a per-host
    ``fetch_seq``; reads resolve LATEST-FETCH-WINS per host, so a
    re-crawl that changed a site's robots.txt supersedes the old rules
    without rewriting anything (append-only ingest, the same CAS loop
    as every other index). A replayed batch appends byte-identical rows
    under the same fetch_seq, which the latest-wins read collapses —
    decisions are replay-stable. Compaction folds the table to each
    host's newest fetch. 100 TB shape: O(robots responses in the batch)
    per batch; the table is bounded by hosts x rules, independent of
    crawl bytes."""

    MAX_DIRS = 16
    KEEP_VERSIONS = 4

    def __init__(
        self,
        store: GoldStore,
        table: str = "robots_rules",
        max_dirs: int | None = None,
        keep_versions: int | None = None,
    ):
        self.store = store
        self.table = table
        self.max_dirs = self.MAX_DIRS if max_dirs is None else max_dirs
        self.keep_versions = self.KEEP_VERSIONS if keep_versions is None else keep_versions

    def __call__(self, warc_batch: DataFrame, batch_id: int) -> int:
        from ..functions.robots import parse_robots

        bodies = warc_batch.filter(
            F.col("corrupt_reason").isNull()
            & (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.lower(F.col("target_uri")).rlike(r"^[a-z][a-z0-9+.-]*://[^/]+/robots\.txt(\?.*)?$")
        ).select(
            F.col("target_uri").alias("url"),
            F.col("payload").cast("string").alias("body"),
        )
        delta = parse_robots(bodies).withColumn(
            "fetch_seq", F.lit(int(batch_id)).cast("bigint")
        ).cache()
        try:
            n_rules = delta.count()
            if n_rules == 0:
                return 0
            last: ConcurrentWriteError | None = None
            for _ in range(5):
                base = self.store.current_version()
                try:
                    self.store.publish_append({self.table: delta}, base)
                    break
                except ConcurrentWriteError as e:
                    last = e
            else:
                raise last
        finally:
            delta.unpersist()
        self._maybe_compact()
        return n_rules

    def _maybe_compact(self) -> None:
        tables = self.store.current_manifest()["tables"]
        entry = tables.get(self.table)
        if entry and len(self.store._dirs(entry)) > self.max_dirs:
            try:
                folded = _latest_rules(self.store.read(self.table))
                self.store.publish({self.table: folded}, self.store.current_version())
                self.store.vacuum(keep_versions=self.keep_versions)
            except ConcurrentWriteError:
                pass  # a concurrent writer won; next batch retries


def _latest_rules(rules: DataFrame) -> DataFrame:
    """Each host's newest fetch (max fetch_seq), duplicates from batch
    replays folded — the read-side resolution of the append-only rules
    history. One host-keyed window + distinct."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("host")
    return (
        rules.withColumn("_mx", F.max("fetch_seq").over(w))
        .filter(F.col("fetch_seq") == F.col("_mx"))
        .drop("_mx")
        .distinct()
    )


def robots_rules_from_store(store: GoldStore, table: str = "robots_rules") -> DataFrame:
    """The current per-host rule set (latest fetch wins), shaped for
    ``functions.robots.robots_decisions``. Empty-shaped frame when no
    robots have been ingested yet (every URL then defaults to
    allowed)."""
    tables = store.current_manifest()["tables"]
    if table not in tables:
        return store.spark.createDataFrame(
            [],
            "host string, agent string, is_allow int, pattern string, "
            "like_pattern string, pattern_len int, crawl_delay double, "
            "fetch_seq bigint",
        )
    return _latest_rules(store.read(table))


def frontier_decisions(
    urls: DataFrame,
    store: GoldStore,
    agent: str,
    table: str = "robots_rules",
    url_col: str = "url",
) -> DataFrame:
    """(url, allowed int, crawl_delay double|null) for candidate
    frontier URLs against the persisted rules — the admission gate a
    crawl scheduler applies before enqueueing fetches. Hosts with no
    ingested robots.txt default to allowed (RFC 9309 5xx/absent
    semantics are the fetcher's concern; the table records what WAS
    fetched)."""
    from ..functions.robots import robots_decisions

    return robots_decisions(
        urls, robots_rules_from_store(store, table).drop("fetch_seq"), agent,
        url_col=url_col,
    )


def prioritized_frontier(
    urls: DataFrame,
    store: GoldStore,
    agent: str,
    robots_table: str = "robots_rules",
    graph_table: str = "host_graph",
    url_col: str = "url",
) -> DataFrame:
    """The crawl scheduler's feed: candidate URLs admitted by the
    persisted robots rules, annotated with the host's PageRank from the
    persisted link graph and ordered best-first:

    (url, host, crawl_delay double|null, rank double)

    Disallowed URLs are dropped; hosts absent from the link graph rank
    0 (still crawled, after known-good hosts). Both inputs are the
    bounded per-host indexes — nothing here scans the corpus."""
    from ..functions.robots import _host_of

    decided = frontier_decisions(urls, store, agent, robots_table, url_col=url_col)
    admitted = decided.filter(F.col("allowed") == 1).select(
        "url", _host_of(F.col("url")).alias("host"), "crawl_delay"
    )
    tables = store.current_manifest()["tables"]
    if graph_table in tables:
        ranks = host_rank_from_store(store, graph_table)
    else:
        ranks = store.spark.createDataFrame([], "host string, rank double")
    return (
        admitted.join(ranks, "host", "left")
        .select(
            "url", "host", "crawl_delay", F.coalesce("rank", F.lit(0.0)).alias("rank")
        )
        .orderBy(F.col("rank").desc(), "url")
    )


def discover_sitemap_urls(warc_batch: DataFrame) -> DataFrame:
    """(host, url, kind) candidates discovered from the batch's
    politeness documents: ``kind='sitemap'`` rows are further sitemap
    fetches (``Sitemap:`` directives inside robots.txt responses and
    ``<loc>`` entries of sitemap-INDEX documents); ``kind='page'`` rows
    are page URLs from urlset documents. Feed the pages (minus the
    persisted URL frontier) into ``prioritized_frontier`` to seed the
    next fetch round — sitemap discovery is how a polite crawler finds
    pages without scraping for links."""
    from ..functions.robots import parse_sitemaps, robots_sitemap_urls, _host_of

    ok = warc_batch.filter(
        F.col("corrupt_reason").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
    )
    robots = ok.filter(
        F.lower(F.col("target_uri")).rlike(r"^[a-z][a-z0-9+.-]*://[^/]+/robots\.txt(\?.*)?$")
    ).select(
        F.col("target_uri").alias("url"),
        F.col("payload").cast("string").alias("body"),
    )
    from_robots = robots_sitemap_urls(robots).select(
        "host", F.col("sitemap_url").alias("url"), F.lit("sitemap").alias("kind")
    )
    xml = ok.filter(
        F.lower(F.col("target_uri")).rlike(r"\.xml(\.gz)?(\?.*)?$")
        | F.col("mime").isin("application/xml", "text/xml")
    ).select(
        F.col("target_uri").alias("url"),
        F.col("payload").cast("string").alias("body"),
    )
    from_xml = parse_sitemaps(xml).select(
        _host_of(F.col("loc")).alias("host"),
        F.col("loc").alias("url"),
        F.when(F.col("kind") == "index", F.lit("sitemap"))
        .otherwise(F.lit("page"))
        .alias("kind"),
    )
    return from_robots.unionByName(from_xml).distinct()


def discover_frontier_urls(
    warc: DataFrame, store: GoldStore, url_table: str = "url_frontier"
) -> DataFrame:
    """Candidate next-frontier URLs from a raw WARC batch: links
    extracted from the batch's clean HTML pages plus sitemap page
    discoveries, distinct, minus everything already in the persisted
    URL frontier. Shared by ``crawl_tick`` and the composed-tick bench
    (scripts/bench_warc.py) so the measured stage sequence cannot
    drift from the shipped one (r13 review)."""
    from ..functions.weburl import canonical_url, extract_links

    pages = warc.filter(
        F.col("corrupt_reason").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("mime").startswith("text/html")
    ).select(
        F.col("target_uri").alias("url"),
        F.col("payload").cast("string").alias("html"),
    )
    discovered = (
        extract_links(pages, "html", "url")
        .select(F.col("link").alias("url"))
        .unionByName(
            discover_sitemap_urls(warc).filter(F.col("kind") == "page").select("url")
        )
        .distinct()
    )
    tables = store.current_manifest()["tables"]
    if url_table in tables:
        seen = store.read(url_table).select("url_digest")
        discovered = discovered.withColumn(
            "_ud", F.xxhash64(canonical_url("url"))
        ).join(
            seen.withColumnRenamed("url_digest", "_ud"), "_ud", "left_anti"
        ).drop("_ud")
    return discovered


def crawl_tick(
    spark: SparkSession,
    warc_path: str,
    store: GoldStore,
    agent: str = "sparkgraftbot",
    k: int | None = None,
) -> dict:
    """One full crawl maintenance tick over a dump of raw WARC files —
    the single call a crawl operator runs per fetched batch, composing
    every persisted index the engine maintains:

    1. **robots rules** ingest (RFC 9309, latest-fetch-wins);
    2. **host link graph** ingest (PageRank evidence);
    3. **document curation + dedup-ingest** (boilerplate via the
       persisted per-site index, URL frontier dedup, quality cuts,
       MinHash dedup vs the persisted signatures, atomic publish);
    4. **next frontier**: link + sitemap discoveries, minus the
       persisted URL frontier, gated by the fresh robots rules and
       ordered by host rank.

    Returns ``{"admitted", "robots_rules", "host_pairs", "frontier"}``
    — the counts are O(batch) facts from the sinks; ``frontier`` is a
    LAZY prioritized DataFrame for the fetch scheduler. Each stage
    reads only the batch plus its bounded index, so the tick is
    O(crawl bytes) at any corpus size."""
    warc = read_warc(spark, warc_path)
    n_rules = RobotsIngestSink(store)(warc, batch_id=store.current_version())
    n_pairs = HostGraphIngestSink(store)(warc, batch_id=store.current_version())

    docs = distill_and_curate(spark, warc_path)
    sink = CuratedCorpusIngestSink(store, k=k)
    admitted = sink(docs, batch_id=-1)

    discovered = discover_frontier_urls(warc, store, sink.url_table)
    frontier = prioritized_frontier(discovered, store, agent)
    return {
        "admitted": admitted,
        "robots_rules": n_rules,
        "host_pairs": n_pairs,
        "frontier": frontier,
    }


class CrawlStreamSink:
    """The streaming form of ``crawl_tick``: one foreachBatch callable
    over RAW record micro-batches (``open_warc_records_stream``) that
    maintains every persisted crawl index per batch — robots rules,
    host graph, and the curated deduplicated corpus (URL frontier +
    boilerplate evidence ride the curated sink). All sinks share one
    store through the ordinary CAS loop; each touches only its own
    record slice of the batch plus its bounded index. The next fetch
    frontier is pull-based — call ``prioritized_frontier`` (or
    ``crawl_tick`` over a dump) off the persisted state whenever the
    scheduler wants it."""

    def __init__(self, store: GoldStore, k: int | None = None, **curated_kwargs):
        self.robots = RobotsIngestSink(store)
        self.hosts = HostGraphIngestSink(store)
        self.docs = CuratedCorpusIngestSink(store, k=k, **curated_kwargs)

    def __call__(self, warc_batch: DataFrame, batch_id: int) -> int:
        self.robots(warc_batch, batch_id)
        self.hosts(warc_batch, batch_id)
        docs = (
            warc_to_documents(warc_batch, lines=True)
            .unionByName(warc_to_pdf_documents(warc_batch))
            .unionByName(warc_to_office_documents(warc_batch))
        )
        return self.docs(docs, batch_id)
