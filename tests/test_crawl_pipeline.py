"""End-to-end crawl curation (plans/crawl.py): WARC bytes in, curated
deduplicated corpus out — every stage's effect visible in one run:
URL-frontier dedup, per-site boilerplate stripping, length and
compression cuts, content dedup at publish, idempotent re-run."""

import pytest

from rustcheatersdatapipeline_spark.plans.crawl import curate_crawl, distill_and_curate
from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore
from tests.test_warc_source import http_response, warc_record

NAV = "home | products | about | contact"
FOOTER = "(c) site-a 2026 - all rights reserved"


def _page(body_paras: list[str], site: str = "a") -> bytes:
    paras = "".join(f"<p>{p}</p>" for p in body_paras)
    html = (
        f"<html><head><title>{site}</title><style>x{{}}</style></head>"
        f"<body><nav>{NAV}</nav>{paras}<footer>{FOOTER}</footer></body></html>"
    )
    return http_response(html.encode())


def _para(seed: int) -> str:
    words = " ".join(f"w{seed}x{j}q{(seed * 31 + j * 7) % 97}" for j in range(30))
    return f"article {seed}: {words}"


def _crawl_bytes() -> bytes:
    recs = []
    for i in range(4):  # site a: 4 pages, shared nav/footer, unique bodies
        recs.append(
            warc_record(
                "response", f"http://a.test/p{i}", _page([_para(i)]), rid=f"<urn:a{i}>"
            )
        )
    # URL duplicate of p0 (tracking params + fragment) — frontier dedup
    recs.append(
        warc_record(
            "response",
            "http://a.test/p0?utm_source=tw#frag",
            _page([_para(0)]),
            rid="<urn:a0dup>",
        )
    )
    # spam page: highly repetitive → compression cut
    recs.append(
        warc_record(
            "response",
            "http://a.test/spam",
            _page(["buy now " * 120]),
            rid="<urn:spam>",
        )
    )
    # stub page: nothing left after boilerplate → length cut
    recs.append(
        warc_record("response", "http://a.test/stub", _page(["ok"]), rid="<urn:stub>")
    )
    # site b: only 2 pages (below MIN_GROUP_DOCS) — nav survives there
    for i in range(2):
        recs.append(
            warc_record(
                "response",
                f"http://b.test/q{i}",
                _page([_para(100 + i)], site="b"),
                rid=f"<urn:b{i}>",
            )
        )
    return b"".join(recs)


@pytest.mark.slow
def test_distill_and_curate_stage_effects(spark, tmp_path):
    (tmp_path / "dump.warc").write_bytes(_crawl_bytes())
    out = {r["source"]: r for r in distill_and_curate(spark, str(tmp_path)).collect()}
    # survivors: site a's 4 articles + site b's 2 (spam and stub cut;
    # the utm duplicate collapsed into p0 by frontier dedup)
    assert set(out) == {
        *(f"http://a.test/p{i}" for i in range(4)),
        "http://b.test/q0",
        "http://b.test/q1",
    }
    # site a: nav/footer/title template lines stripped, article kept
    a0 = out["http://a.test/p0"]["text"]
    assert NAV not in a0 and FOOTER not in a0 and "article 0:" in a0
    # site b (2 docs < min group): template survives — frequency has no
    # signal there
    assert NAV in out["http://b.test/q0"]["text"]


@pytest.mark.slow
def test_curate_crawl_publishes_and_is_idempotent(spark, tmp_path, monkeypatch):
    (tmp_path / "dump.warc").write_bytes(_crawl_bytes())
    store = GoldStore(spark, str(tmp_path / "gold"))
    # the admitted count must come from the sink (O(batch)), never from
    # scanning the corpus table (O(corpus)) — record every table read
    # made while curate_crawl runs and assert the corpus is untouched
    reads: list[str] = []
    orig_read = GoldStore.read

    def tracking_read(self, name):
        reads.append(name)
        return orig_read(self, name)

    monkeypatch.setattr(GoldStore, "read", tracking_read)
    admitted = curate_crawl(spark, str(tmp_path), store, k=9)
    assert admitted == 6
    assert "corpus" not in reads  # index reads only — no corpus scan
    corpus = {r["source"]: r["text"] for r in store.read("corpus").collect()}
    assert len(corpus) == 6 and NAV not in corpus["http://a.test/p1"]
    assert store.read("dedup_index").count() == 6
    # re-running the same dump admits nothing (content dedup vs index)
    reads.clear()
    assert curate_crawl(spark, str(tmp_path), store, k=9) == 0
    assert "corpus" not in reads
    assert store.read("corpus").count() == 6


def test_pdf_responses_join_the_curated_corpus(spark, tmp_path):
    """A crawl mixing HTML and PDF responses distills both; garbage-font
    PDFs are gated out by printable fraction."""
    from tests.test_pdftext import make_pdf

    good_pdf = make_pdf(
        b"BT (A reasonably long PDF paragraph about data pipelines, "
        b"partitioning and shuffle volume, with enough characters to "
        b"clear the length floor for curated documents.) Tj ET",
        flate=True,
    )
    garbage_pdf = make_pdf(b"BT <010203040506070809> Tj ET")
    recs = _crawl_bytes() + b"".join(
        (
            warc_record(
                "response",
                "http://a.test/doc.pdf",
                http_response(good_pdf, ctype="application/pdf"),
                rid="<urn:pdf1>",
            ),
            warc_record(
                "response",
                "http://a.test/junkfont.pdf",
                http_response(garbage_pdf, ctype="application/pdf"),
                rid="<urn:pdf2>",
            ),
        )
    )
    (tmp_path / "dump.warc").write_bytes(recs)
    out = {r["source"]: r for r in distill_and_curate(spark, str(tmp_path)).collect()}
    assert "http://a.test/doc.pdf" in out
    assert "partitioning and shuffle volume" in out["http://a.test/doc.pdf"]["text"]
    assert "http://a.test/junkfont.pdf" not in out  # printable gate


@pytest.mark.slow
def test_streaming_curated_sink_strips_boilerplate(spark, tmp_path):
    """Drop-folder stream through CuratedCorpusIngestSink: published
    text is template-free and re-crawls are deduplicated."""
    from rustcheatersdatapipeline_spark.plans.crawl import CuratedCorpusIngestSink
    from rustcheatersdatapipeline_spark.sources.warc import (
        open_warc_documents_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = CuratedCorpusIngestSink(store, k=9)

    def run():
        q = (
            open_warc_documents_stream(spark, str(drop), lines=True)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    (tmp_path / "drop" / "a.warc").write_bytes(_crawl_bytes())
    run()
    corpus = {r["source"]: r["text"] for r in store.read("corpus").collect()}
    assert len(corpus) == 6
    assert NAV not in corpus["http://a.test/p2"]
    # re-crawl file: one verbatim page under a new uri -> deduped
    (tmp_path / "drop" / "b.warc").write_bytes(
        warc_record("response", "http://mirror/p1", _page([_para(1)]), rid="<urn:m1>")
    )
    run()
    # the mirror page is a 1-doc site: boilerplate stays, so its text is
    # NOT an exact dup of the curated a.test/p1 — but the near-dup index
    # still catches it (shared article body dominates the shingles)
    assert store.read("corpus").count() == 6


@pytest.mark.slow
def test_streaming_one_page_per_batch_converges_after_repair(spark, tmp_path):
    """The round-6 gap: within-batch frequency cannot see a site spread
    one-page-per-batch. With the persisted per-site index + repair
    sweep, the streamed corpus must converge to EXACTLY the batch
    curate_crawl result: early pages lose their retroactively-frequent
    template, and the stub page (below the length floor once clean) is
    removed."""
    from rustcheatersdatapipeline_spark.plans.crawl import (
        CuratedCorpusIngestSink,
        repair_boilerplate,
    )
    from rustcheatersdatapipeline_spark.sources.warc import (
        open_warc_documents_stream,
    )

    pages = [
        warc_record(
            "response", f"http://a.test/p{i}", _page([_para(i)]), rid=f"<urn:a{i}>"
        )
        for i in range(4)
    ]
    stub = warc_record("response", "http://a.test/stub", _page(["ok"]), rid="<urn:stub>")

    # batch oracle: one sweep over all five pages
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    (batch_dir / "dump.warc").write_bytes(b"".join(pages) + stub)
    batch_store = GoldStore(spark, str(tmp_path / "gold_batch"))
    curate_crawl(spark, str(batch_dir), batch_store, k=9)
    expected = {r["source"]: r["text"] for r in batch_store.read("corpus").collect()}
    assert len(expected) == 4 and "http://a.test/stub" not in expected

    # streaming: ONE page per micro-batch
    drop = tmp_path / "drop"
    drop.mkdir()
    store = GoldStore(spark, str(tmp_path / "gold_stream"))
    sink = CuratedCorpusIngestSink(store, k=9)
    for i, rec in enumerate([*pages, stub]):
        (drop / f"f{i}.warc").write_bytes(rec)
        q = (
            open_warc_documents_stream(spark, str(drop), lines=True)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # pages 0-1 were admitted before the template crossed the threshold
    pre = {r["source"]: r["text"] for r in store.read("corpus").collect()}
    assert NAV in pre["http://a.test/p0"]  # stale template present
    assert NAV not in pre["http://a.test/p3"]  # late pages strip at ingest

    repaired = repair_boilerplate(store)
    assert repaired > 0
    got = {r["source"]: r["text"] for r in store.read("corpus").collect()}
    assert got == expected
    # converged: the sweep is a version-stable no-op from here
    assert repair_boilerplate(store) == 0


@pytest.mark.slow
def test_url_frontier_drops_recrawls_across_batches(spark, tmp_path):
    """A URL re-crawled in a LATER batch with CHANGED content (rotating
    ads — content dedup would admit it) is dropped by the persisted URL
    frontier; a genuinely new URL still enters. Replays stay
    version-stable."""
    from rustcheatersdatapipeline_spark.plans.crawl import CuratedCorpusIngestSink
    from rustcheatersdatapipeline_spark.sources.warc import (
        open_warc_documents_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = CuratedCorpusIngestSink(store, k=9)

    def run():
        q = (
            open_warc_documents_stream(spark, str(drop), lines=True)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    (drop / "a.warc").write_bytes(
        b"".join(
            warc_record(
                "response", f"http://a.test/p{i}", _page([_para(i)]), rid=f"<urn:a{i}>"
            )
            for i in range(4)
        )
    )
    run()
    assert store.read("corpus").count() == 4
    v_after_first = store.current_version()

    # batch 2: p1 re-crawled with DIFFERENT body (would pass content
    # dedup) + one genuinely new page
    (drop / "b.warc").write_bytes(
        warc_record(
            "response",
            "http://a.test/p1?utm_source=feed",  # canonicalizes to p1
            _page([_para(99)]),
            rid="<urn:re1>",
        )
        + warc_record(
            "response", "http://a.test/p9", _page([_para(9)]), rid="<urn:a9>"
        )
    )
    run()
    corpus = {r["source"] for r in store.read("corpus").collect()}
    assert "http://a.test/p9" in corpus
    assert len(corpus) == 5  # the re-crawl never entered
    # the frontier indexes every first-seen canonical url
    from rustcheatersdatapipeline_spark.functions.weburl import canonical_url
    from pyspark.sql import functions as F

    expected = (
        spark.createDataFrame(
            [(f"http://a.test/p{i}",) for i in (0, 1, 2, 3, 9)], "u string"
        )
        .select(F.xxhash64(canonical_url("u")).alias("d"))
        .collect()
    )
    frontier = {r["url_digest"] for r in store.read("url_frontier").collect()}
    assert {r["d"] for r in expected} <= frontier

    # replaying both files through a fresh checkpoint admits nothing
    v = store.current_version()
    sink2 = CuratedCorpusIngestSink(store, k=9)
    q = (
        open_warc_documents_stream(spark, str(drop), lines=True)
        .writeStream.foreachBatch(sink2)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert store.current_version() == v
    assert store.read("corpus").count() == 5


@pytest.mark.slow
def test_repair_runs_automatically_on_compaction(spark, tmp_path):
    """With a small max_dirs, the boilerplate index compacts mid-stream
    and the repair sweep rides the rewrite: early pages lose their
    template WITHOUT any explicit repair call."""
    from rustcheatersdatapipeline_spark.plans.crawl import CuratedCorpusIngestSink
    from rustcheatersdatapipeline_spark.sources.warc import (
        open_warc_documents_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = CuratedCorpusIngestSink(store, k=9, max_dirs=2)
    for i in range(5):
        (drop / f"f{i}.warc").write_bytes(
            warc_record(
                "response", f"http://a.test/p{i}", _page([_para(i)]), rid=f"<urn:a{i}>"
            )
        )
        q = (
            open_warc_documents_stream(spark, str(drop), lines=True)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    corpus = {r["source"]: r["text"] for r in store.read("corpus").collect()}
    assert len(corpus) == 5
    assert NAV not in corpus["http://a.test/p0"]  # repaired by compaction
    assert NAV not in corpus["http://a.test/p4"]


@pytest.mark.slow
def test_crawl_tick_composes_every_index(spark, tmp_path):
    """One crawl_tick over a mixed batch must: ingest robots rules,
    accumulate the host graph, admit curated documents, and emit a
    prioritized next frontier that respects robots and drops seen
    URLs."""
    from rustcheatersdatapipeline_spark.plans.crawl import crawl_tick

    recs = []
    for i in range(4):
        body = _page([_para(i), f'<a href="http://hub.test/x{i}">hub</a>'])
        recs.append(
            warc_record("response", f"http://a.test/p{i}", body, rid=f"<urn:t{i}>")
        )
    robots = (
        "User-agent: *\nDisallow: /private/\n"
        "Sitemap: http://a.test/sitemap.xml\n"
    )
    recs.append(
        warc_record(
            "response", "http://a.test/robots.txt",
            http_response(robots.encode(), ctype="text/plain"), rid="<urn:rb>",
        )
    )
    sm = (
        '<?xml version="1.0"?><urlset><url><loc>http://a.test/new-page</loc></url>'
        "<url><loc>http://hub.test/private/blocked</loc></url></urlset>"
    )
    recs.append(
        warc_record(
            "response", "http://a.test/sitemap.xml",
            http_response(sm.encode(), ctype="application/xml"), rid="<urn:sm>",
        )
    )
    # hub.test's robots blocks /private/ too
    recs.append(
        warc_record(
            "response", "http://hub.test/robots.txt",
            http_response(b"User-agent: *\nDisallow: /private/\n", ctype="text/plain"),
            rid="<urn:rb2>",
        )
    )
    p = tmp_path / "crawl.warc"
    p.write_bytes(b"".join(recs))
    store = GoldStore(spark, str(tmp_path / "gold"))
    out = crawl_tick(spark, str(p), store, agent="testbot", k=9)
    assert out["admitted"] >= 4
    assert out["robots_rules"] >= 2
    assert out["host_pairs"] >= 1
    frontier = out["frontier"].collect()
    urls = [r["url"] for r in frontier]
    # discovered, robots-allowed, unseen URLs only
    assert "http://a.test/new-page" in urls
    assert all("/private/" not in u for u in urls)
    # crawled pages are already in the url frontier — never re-enqueued
    assert all(not u.startswith("http://a.test/p") for u in urls)
    # hub.test is the only linked host — it outranks unlinked hosts
    ranks = {r["url"]: r["rank"] for r in frontier}
    hub = [u for u in urls if u.startswith("http://hub.test/")]
    assert hub and all(ranks[h] >= max(ranks.values()) - 1e-12 for h in hub)
