"""Scaling-trend bench: run the headline queries at sf0.1 and at a
synthetic 10x replica ("sf1") and report the time ratios.

Usage: python scripts/bench_scale.py [--rebuild] [query ...]

The sf1 data is derived from /root/testdata/sf0.1 (never hand-rolled
distributions) by REPLICAS-fold replication with:

- key offsets (doc_id/vec_id/user_id/event_id/o_orderkey/...) so keyed
  cardinalities scale linearly;
- a per-replica character ROTATION on documents.text (translate over
  [a-z0-9]) so near-duplicate structure is preserved WITHIN a replica
  but cross-replica Jaccard/SimHash similarity collapses to background
  level — a naive copy would turn every dup cluster into a 10x-larger
  clique and make candidate volume quadratic by construction, which
  would measure the generator, not the engine;
- embeddings perturbed by a tiny per-replica rotation of dimensions so
  ANN bucket occupancy scales instead of stacking identical vectors.

A query passes the trend gate when t(sf1) <= 10x * t(sf0.1) * slack
(linear-ish scaling; slack covers fixed overheads and JVM variance).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rustcheatersdatapipeline_spark.catalog import table  # noqa: E402
from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata", "sf1")
REPLICAS = 10

ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"

#: headline queries for the trend (the bench whales + one per family).
#: embed_neardup_cosine is excluded by design: it is the documented
#: O(n^2) correctness baseline, not a scale-path operator.
DEFAULT_QUERIES = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "simhash_neardup",
    "doc_fingerprint",
    "ann_lsh_buckets",
    "ann_lsh_search",
    "text_metrics",
    "corpus_stats",
    "decontaminate",
    "events_sessionize",
    "events_session_attribution",
    "sketch_bounds",
    "q15",
    "q16",
    "q27",
]


def _rot(r: int) -> str:
    k = r % len(ALPHA)
    return ALPHA[k:] + ALPHA[:k]


def build_sf1(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation", "supplier", "part"):
        table(spark, SRC, name).write.mode("overwrite").parquet(f"{DST}/{name}.parquet")

    def replicate(name, offsets):
        base = table(spark, SRC, name)
        parts = []
        for r in range(REPLICAS):
            df = base
            for col, step in offsets.items():
                df = df.withColumn(col, (F.col(col) + F.lit(r * step)).cast("long"))
            if name == "documents":
                df = df.withColumn(
                    "text",
                    F.translate(F.col("text"), ALPHA, _rot(r)) if r else F.col("text"),
                )
            if name == "embeddings" and r:
                # rotate dims: slice+concat keeps norms, changes directions
                df = df.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", r + 1, 64 - r), F.slice("embedding", 1, r)
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")

    replicate("customer", {"c_custkey": 1_000_000})
    replicate("orders", {"o_orderkey": 10_000_000, "o_custkey": 1_000_000})
    replicate(
        "lineitem", {"l_orderkey": 10_000_000}
    )
    replicate("documents", {"doc_id": 1_000_000})
    replicate("embeddings", {"vec_id": 1_000_000})
    # events: ts stays (windows scale by user count), users/event ids offset
    ev = table(spark, SRC, "events")
    parts = []
    for r in range(REPLICAS):
        parts.append(
            ev.withColumn("user_id", (F.col("user_id") + F.lit(r * 1_000_000)).cast("long"))
            .withColumn("event_id", (F.col("event_id") + F.lit(r * 100_000_000)).cast("long"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/events.parquet")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rebuild = "--rebuild" in sys.argv
    names = args or DEFAULT_QUERIES

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if rebuild or not os.path.exists(f"{DST}/events.parquet"):
        print("building sf1 replica ...", flush=True)
        build_sf1(spark)

    import __spark_entry__ as entry

    qs = entry.queries()
    results = {}
    for name in names:
        fn = qs[name]
        times = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            times[label] = round(time.time() - t0, 2)
            times[f"rows_{label}"] = n
        ratio = times["sf1"] / max(times["sf0.1"], 0.01)
        results[name] = {**times, "ratio": round(ratio, 1), "linear_ok": ratio <= 15.0}
        print(name, "->", json.dumps(results[name]), flush=True)

    bad = [k for k, v in results.items() if not v["linear_ok"]]
    print(json.dumps({"metric": "scale_trend", "queries": results, "superlinear": bad}))


if __name__ == "__main__":
    main()
