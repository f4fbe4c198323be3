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


if __name__ == "__main__":
    main()
