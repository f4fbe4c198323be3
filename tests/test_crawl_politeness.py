"""Persisted robots rules + the scheduler's frontier feed.

The reference's politeness analog is its per-request rate limiting
(SteamToS3Operator.py:52) — host-level courtesy at fetch time. A web
crawler needs the same discipline at FRONTIER time: robots admission,
crawl delay, and host prioritization, all from persisted bounded
indexes, never a corpus scan.
"""

import pytest
from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.plans.crawl import (
    HostGraphIngestSink,
    RobotsIngestSink,
    discover_sitemap_urls,
    frontier_decisions,
    prioritized_frontier,
    robots_rules_from_store,
)
from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore

WARC_COLS = (
    "warc_file string, record_offset bigint, record_id string, warc_type string, "
    "target_uri string, warc_date string, http_status int, mime string, "
    "payload binary, n_bytes bigint, corrupt_reason string"
)


def _warc_batch(spark, rows):
    """rows: (target_uri, mime, payload_str) → 200-OK response records."""
    data = [
        ("f", 0, f"r{i}", "response", uri, "2026-01-01", 200, mime,
         body.encode(), len(body), None)
        for i, (uri, mime, body) in enumerate(rows)
    ]
    return spark.createDataFrame(data, WARC_COLS)


ROBOTS_A_V1 = "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"
ROBOTS_A_V2 = "User-agent: *\nDisallow: /\nAllow: /public/\n"
ROBOTS_B = "User-agent: testbot\nDisallow: /tmp/\n"


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _decide(spark, store, urls, agent="testbot"):
    rows = frontier_decisions(_urls(spark, urls), store, agent).collect()
    return {r["url"]: (r["allowed"], r["crawl_delay"]) for r in rows}


@pytest.mark.slow
def test_ingest_decide_and_latest_fetch_wins(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = RobotsIngestSink(store)
    n = sink(
        _warc_batch(
            spark,
            [
                ("http://a.test/robots.txt", "text/plain", ROBOTS_A_V1),
                ("http://b.test/robots.txt", "text/plain", ROBOTS_B),
                # non-robots response in the same batch is ignored
                ("http://a.test/page", "text/html", "<html>hi</html>"),
            ],
        ),
        batch_id=1,
    )
    assert n > 0
    d = _decide(
        spark,
        store,
        [
            "http://a.test/private/x",
            "http://a.test/ok",
            "http://b.test/tmp/y",
            "http://c.test/anything",  # no robots fetched → allowed
        ],
    )
    assert d["http://a.test/private/x"][0] == 0
    assert d["http://a.test/ok"] == (1, 2.0)
    assert d["http://b.test/tmp/y"][0] == 0
    assert d["http://c.test/anything"][0] == 1

    # a later refetch of a.test supersedes its rules; b.test unaffected
    sink(
        _warc_batch(spark, [("http://a.test/robots.txt", "text/plain", ROBOTS_A_V2)]),
        batch_id=2,
    )
    d = _decide(
        spark,
        store,
        ["http://a.test/private/x", "http://a.test/public/x", "http://b.test/tmp/y"],
    )
    assert d["http://a.test/private/x"][0] == 0  # now the blanket Disallow: /
    assert d["http://a.test/public/x"][0] == 1  # Allow override survives
    assert d["http://a.test/private/x"][1] is None  # v2 dropped the delay
    assert d["http://b.test/tmp/y"][0] == 0


@pytest.mark.slow
def test_replayed_batch_is_decision_stable(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = RobotsIngestSink(store)
    batch = _warc_batch(
        spark, [("http://a.test/robots.txt", "text/plain", ROBOTS_A_V1)]
    )
    sink(batch, batch_id=7)
    before = _decide(spark, store, ["http://a.test/private/x", "http://a.test/ok"])
    sink(batch, batch_id=7)  # foreachBatch replay: same batch id
    assert _decide(spark, store, ["http://a.test/private/x", "http://a.test/ok"]) == before
    # and the resolved rule set itself has no duplicate rows
    rules = robots_rules_from_store(store)
    assert rules.count() == rules.distinct().count()


@pytest.mark.slow
def test_compaction_folds_to_latest_per_host(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = RobotsIngestSink(store, max_dirs=2)
    for i, body in enumerate([ROBOTS_A_V1, ROBOTS_A_V2, ROBOTS_A_V1, ROBOTS_A_V2]):
        sink(
            _warc_batch(spark, [("http://a.test/robots.txt", "text/plain", body)]),
            batch_id=i,
        )
    entry = store.current_manifest()["tables"]["robots_rules"]
    assert len(store._dirs(entry)) <= 2  # compaction ran
    # post-compaction decisions reflect the newest fetch only
    d = _decide(spark, store, ["http://a.test/private/x", "http://a.test/public/x"])
    assert d["http://a.test/private/x"][0] == 0
    assert d["http://a.test/public/x"][0] == 1


@pytest.mark.slow
def test_prioritized_frontier_orders_by_host_rank(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    RobotsIngestSink(store)(
        _warc_batch(spark, [("http://low.test/robots.txt", "text/plain", "User-agent: *\nDisallow: /no/\n")]),
        batch_id=1,
    )
    # hub.test is linked from two hosts, low.test from none
    html = '<a href="http://hub.test/x">x</a>'
    HostGraphIngestSink(store)(
        _warc_batch(
            spark,
            [
                ("http://s1.test/p", "text/html", html),
                ("http://s2.test/p", "text/html", html),
            ],
        ),
        batch_id=1,
    )
    feed = prioritized_frontier(
        _urls(
            spark,
            [
                "http://hub.test/a",
                "http://low.test/ok",
                "http://low.test/no/blocked",
            ],
        ),
        store,
        agent="testbot",
    ).collect()
    urls = [r["url"] for r in feed]
    assert "http://low.test/no/blocked" not in urls  # robots-disallowed dropped
    assert urls[0] == "http://hub.test/a"  # linked host ranks first
    ranks = {r["url"]: r["rank"] for r in feed}
    assert ranks["http://hub.test/a"] > ranks["http://low.test/ok"] == 0.0


def test_prioritized_frontier_without_any_indexes(spark, tmp_path):
    """Cold start: no robots, no graph — everything admitted at rank 0."""
    store = GoldStore(spark, str(tmp_path / "gold"))
    feed = prioritized_frontier(
        _urls(spark, ["http://x.test/a", "http://y.test/b"]), store, agent="bot"
    ).collect()
    assert {r["url"] for r in feed} == {"http://x.test/a", "http://y.test/b"}
    assert all(r["rank"] == 0.0 for r in feed)


SITEMAP_URLSET = (
    '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>http://a.test/page1</loc></url>"
    "<url><loc>http://a.test/page2</loc></url></urlset>"
)
SITEMAP_INDEX = (
    '<?xml version="1.0"?><sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc>http://a.test/sitemap-2.xml</loc></sitemap></sitemapindex>"
)


def test_discover_sitemap_urls(spark):
    batch = _warc_batch(
        spark,
        [
            (
                "http://a.test/robots.txt",
                "text/plain",
                "User-agent: *\nDisallow:\nSitemap: http://a.test/sitemap.xml\n",
            ),
            ("http://a.test/sitemap.xml", "application/xml", SITEMAP_URLSET),
            ("http://a.test/sitemap-index.xml", "text/xml", SITEMAP_INDEX),
            ("http://a.test/page1", "text/html", "<html></html>"),
        ],
    )
    got = {(r["host"], r["url"], r["kind"]) for r in discover_sitemap_urls(batch).collect()}
    assert ("a.test", "http://a.test/sitemap.xml", "sitemap") in got
    assert ("a.test", "http://a.test/page1", "page") in got
    assert ("a.test", "http://a.test/page2", "page") in got
    assert ("a.test", "http://a.test/sitemap-2.xml", "sitemap") in got
    assert all(k in ("sitemap", "page") for _, _, k in got)


def test_crawl_stream_sink_maintains_every_index(spark, tmp_path):
    """Drop-folder records stream through CrawlStreamSink: one batch
    populates corpus, robots rules, host graph and URL frontier; a
    replayed drop leaves every table version-stable."""
    from rustcheatersdatapipeline_spark.plans.crawl import CrawlStreamSink
    from rustcheatersdatapipeline_spark.sources.warc import open_warc_records_stream
    from tests.test_warc_source import http_response, warc_record

    para = " ".join(f"w{j}q{(j * 7) % 31}" for j in range(40))
    recs = b"".join(
        [
            warc_record(
                "response",
                f"http://a.test/p{i}",
                http_response(
                    f'<html><body><p>article {i}: {para}</p>'
                    f'<a href="http://hub.test/x">h</a></body></html>'.encode()
                ),
                rid=f"<urn:s{i}>",
            )
            for i in range(3)
        ]
        + [
            warc_record(
                "response",
                "http://a.test/robots.txt",
                http_response(b"User-agent: *\nDisallow: /no/\n", ctype="text/plain"),
                rid="<urn:srb>",
            )
        ]
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = CrawlStreamSink(store, k=9)

    def run(ck):
        q = (
            open_warc_records_stream(spark, str(drop))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    (drop / "a.warc").write_bytes(recs)
    run("ck1")
    tables = store.current_manifest()["tables"]
    for t in ("corpus", "robots_rules", "host_graph", "url_frontier"):
        assert t in tables, t
    assert store.read("corpus").count() == 3
    d = _decide(spark, store, ["http://a.test/no/x", "http://a.test/ok"])
    assert d["http://a.test/no/x"][0] == 0 and d["http://a.test/ok"][0] == 1
    hg = store.read("host_graph").collect()
    assert {(r["src_host"], r["dst_host"]) for r in hg} == {("a.test", "hub.test")}

    # replay: fresh checkpoint re-delivers the same file — corpus and
    # frontier must not grow
    v = store.current_version()
    n_corpus = store.read("corpus").count()
    run("ck2")
    assert store.read("corpus").count() == n_corpus
    # robots/host sinks append advisory rows; decisions and ranks stable
    d2 = _decide(spark, store, ["http://a.test/no/x", "http://a.test/ok"])
    assert d2 == d
