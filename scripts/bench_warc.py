"""WARC ingestion throughput bench: generate a synthetic crawl (N files
x M records of templated HTML, gzip multi-member like Common Crawl),
then measure the full distill path — read_warc -> warc_to_documents ->
count — and report MB/s of compressed input per core.

Usage: python scripts/bench_warc.py [--files N] [--records M]

Prints ONE JSON line:
  {"metric": "warc_distill", "mb": ..., "sec": ..., "mb_per_s": ...,
   "docs": ..., "files": N}

The number that matters at 100 TB is MB/s/core x cores: the source
parallelizes per file (gzip is not block-splittable), so cluster
throughput = this figure x executor count, as long as files >> cores.
"""

from __future__ import annotations

import gzip
import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402
from rustcheatersdatapipeline_spark.sources.warc import (  # noqa: E402
    read_warc,
    warc_to_documents,
)

WORDS = (
    "training data pipeline shuffle partition broadcast parquet arrow "
    "column predicate pushdown dedup shingle jaccard minhash simhash "
    "cluster executor driver manifest snapshot vacuum compact publish"
).split()


def _record(rng: random.Random, i: int) -> bytes:
    paras = " ".join(
        "<p>" + " ".join(rng.choices(WORDS, k=40)) + f" token{i}-{j}</p>"
        for j in range(rng.randint(5, 15))
    )
    body = (
        "<html><head><title>page</title><style>b{}</style></head>"
        f"<body><nav>home | about | contact</nav>{paras}"
        "<footer>(c) bench</footer></body></html>"
    ).encode()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    hdr = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:bench:{i}>\r\n"
        f"WARC-Target-URI: http://bench.test/{i}\r\n"
        f"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: application/http\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return hdr + http + b"\r\n\r\n"


def main() -> None:
    files = 32
    records = 400
    args = sys.argv[1:]
    if "--files" in args:
        files = int(args[args.index("--files") + 1])
    if "--records" in args:
        records = int(args[args.index("--records") + 1])

    spark = get_spark(app_name="warc-bench")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as d:
        total = 0
        for f in range(files):
            rng = random.Random(f)
            # per-record gzip members, the Common Crawl layout
            payload = b"".join(
                gzip.compress(_record(rng, f * records + i), 1)
                for i in range(records)
            )
            path = os.path.join(d, f"crawl-{f:04d}.warc.gz")
            with open(path, "wb") as fh:
                fh.write(payload)
            total += len(payload)

        times = []
        n = 0
        for _ in range(3):  # first run carries JVM/scheduler warmup
            t0 = time.time()
            n = warc_to_documents(read_warc(spark, d)).count()
            times.append(time.time() - t0)
        sec = sorted(times)[1]  # median
        mb = total / 1e6
        print(
            json.dumps(
                {
                    "metric": "warc_distill",
                    "mb": round(mb, 1),
                    "sec": round(sec, 2),
                    "mb_per_s": round(mb / sec, 1),
                    "docs": n,
                    "files": files,
                }
            )
        )




# ---------------------------------------------------------------------------
# composed crawl-tick scale gate (VERDICT r12 #8): the end-to-end
# maintenance path — robots + host graph + curated dedup-ingest +
# frontier — at 1x and 10x WARC volume, per-stage breakdown.
# ---------------------------------------------------------------------------

def _tick_record(rng: random.Random, i: int, hosts: int) -> bytes:
    """Crawl-shaped record: per-host URLs, cross-host anchors (link
    graph + frontier discovery fuel), every ~50th page is that host's
    robots.txt (politeness fuel)."""
    host = f"h{i % hosts}.bench.test"
    if i % 50 == 49:
        body = b"User-agent: *\r\nDisallow: /private\r\nCrawl-delay: 1\r\n"
        uri = f"http://{host}/robots.txt"
        ctype = b"text/plain"
    else:
        links = " ".join(
            f'<a href="http://h{(i + d) % hosts}.bench.test/p{i + d}">l{d}</a>'
            for d in (1, 7, 13)
        )
        paras = " ".join(
            "<p>" + " ".join(rng.choices(WORDS, k=40)) + f" token{i}-{j}</p>"
            for j in range(rng.randint(5, 15))
        )
        body = (
            "<html><head><title>page</title></head>"
            f"<body><nav>home | about | contact</nav>{links}{paras}"
            "<footer>(c) bench</footer></body></html>"
        ).encode()
        uri = f"http://{host}/p{i}"
        ctype = b"text/html; charset=utf-8"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    hdr = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:bench:{i}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: application/http\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return hdr + http + b"\r\n\r\n"


def _gen_tick_corpus(d: str, files: int, records: int, hosts: int, offset: int) -> int:
    total = 0
    for f in range(files):
        rng = random.Random(10_000 + offset + f)
        payload = b"".join(
            gzip.compress(_tick_record(rng, offset + f * records + i, hosts), 1)
            for i in range(records)
        )
        path = os.path.join(d, f"crawl-{f:04d}.warc.gz")
        with open(path, "wb") as fh:
            fh.write(payload)
        total += len(payload)
    return total


def _timed_tick(spark, warc_dir: str, gold_dir: str) -> dict:
    """crawl_tick's exact stage sequence (plans/crawl.py crawl_tick)
    with a timer around each stage; frontier is materialized so its
    PageRank/robots joins are inside the measurement."""
    from rustcheatersdatapipeline_spark.plans.crawl import (
        CuratedCorpusIngestSink,
        HostGraphIngestSink,
        RobotsIngestSink,
        discover_frontier_urls,
        distill_and_curate,
        prioritized_frontier,
    )
    from rustcheatersdatapipeline_spark.sources.warc import read_warc
    from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore

    store = GoldStore(spark, gold_dir)
    stages = {}
    t0 = time.time()
    warc = read_warc(spark, warc_dir)
    n_rules = RobotsIngestSink(store)(warc, batch_id=store.current_version())
    stages["robots"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_pairs = HostGraphIngestSink(store)(warc, batch_id=store.current_version())
    stages["host_graph"] = round(time.time() - t0, 2)

    t0 = time.time()
    docs = distill_and_curate(spark, warc_dir)
    sink = CuratedCorpusIngestSink(store)
    admitted = sink(docs, batch_id=-1)
    stages["curate_ingest"] = round(time.time() - t0, 2)

    t0 = time.time()
    # the SHARED discovery helper (plans/crawl.py) — the bench times
    # exactly the code crawl_tick ships, no copy to drift (r13 review)
    discovered = discover_frontier_urls(warc, store, sink.url_table)
    n_frontier = prioritized_frontier(discovered, store, "sparkgraftbot").count()
    stages["frontier"] = round(time.time() - t0, 2)

    stages["wall"] = round(sum(stages.values()), 2)
    stages["counts"] = {
        "admitted": admitted,
        "robots_rules": n_rules,
        "host_pairs": n_pairs,
        "frontier": n_frontier,
    }
    return stages


def main_tick() -> None:
    args = sys.argv[1:]
    files = 8
    records = 200
    hosts = 16
    if "--files" in args:
        files = int(args[args.index("--files") + 1])
    if "--records" in args:
        records = int(args[args.index("--records") + 1])

    spark = get_spark(app_name="crawl-tick-bench")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    with tempfile.TemporaryDirectory() as top:
        for label, nf, offset in (("base", files, 0), ("x10", files * 10, 1_000_000)):
            wd = os.path.join(top, f"warc-{label}")
            gd = os.path.join(top, f"gold-{label}")
            os.makedirs(wd)
            mb = _gen_tick_corpus(wd, nf, records, hosts, offset) / 1e6
            r = _timed_tick(spark, wd, gd)
            r["mb"] = round(mb, 1)
            r["files"] = nf
            results[label] = r
            print(label, "->", json.dumps(r), flush=True)

    ratio = results["x10"]["wall"] / max(results["base"]["wall"], 0.01)
    slack = 10 * 1.5  # the bench_scale linear-trend convention
    per_stage = {
        k: round(results["x10"][k] / max(results["base"][k], 0.01), 1)
        for k in ("robots", "host_graph", "curate_ingest", "frontier")
    }
    print(
        json.dumps(
            {
                "metric": "crawl_tick_scale",
                "base": results["base"],
                "x10": results["x10"],
                "ratio": round(ratio, 1),
                "stage_ratios": per_stage,
                "superlinear": [] if ratio <= slack else ["crawl_tick"],
            }
        )
    )


if __name__ == "__main__":
    if "--tick" in sys.argv:
        main_tick()
    else:
        main()
