"""Scaling-trend bench: run the headline queries at sf0.1 and at a
synthetic Nx replica (10x -> "sf1", 100x -> "sf10") and report ratios.

Usage: python scripts/bench_scale.py [--rebuild] [--replicas N] [query ...]

The replica data is derived from /root/testdata/sf0.1 (never hand-rolled
distributions) by REPLICAS-fold replication with:

- key offsets (doc_id/vec_id/user_id/event_id/o_orderkey/...) so keyed
  cardinalities scale linearly;
- a per-replica PERMUTATION of [a-z0-9] applied to documents.text
  (seeded ``random.Random(r)`` shuffle) so near-duplicate structure is
  preserved WITHIN a replica but cross-replica Jaccard/SimHash
  similarity collapses to background level. (A rotation — the 10x
  harness's original trick — repeats every 36 replicas, which at 100x
  would silently merge dup clusters across replicas 36 apart and
  measure the generator, not the engine; a seeded permutation is
  collision-free at any replica count.)
- embeddings rotated by ``r % 64`` dimensions and NEGATED for
  ``r >= 64`` (both norm- and cosine-structure-preserving within a
  replica, direction-scrambling across replicas) so ANN bucket
  occupancy scales instead of stacking identical vectors.

A query passes the trend gate when t(sfN) <= Nx * t(sf0.1) * slack
(linear-ish scaling; slack covers fixed overheads and JVM variance).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rustcheatersdatapipeline_spark.catalog import table  # noqa: E402
from rustcheatersdatapipeline_spark import plan_cache  # noqa: E402
from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
BENCHDATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata"
)

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
    "hybrid_search_rrf",
    "mixture_token_budget_sample",
]

#: the whales for the expensive 100x run (VERDICT r5 directive #4;
#: r11 adds the two r10-promoted flagship ops per VERDICT r10 #5)
WHALE_QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "simhash_neardup",
    "ann_lsh_search",
    "events_sessionize",
    "q16",
    "hybrid_search_rrf",
    "mixture_token_budget_sample",
]


def _perm(r: int) -> str:
    """Deterministic per-replica permutation of ALPHA; identity at r=0."""
    if r == 0:
        return ALPHA
    chars = list(ALPHA)
    random.Random(r).shuffle(chars)
    return "".join(chars)


#: fixed navigation/footer boilerplate for the content-skew variant:
#: injected VERBATIM (after the per-replica permutation) so its
#: shingles / W-grams are the same hot keys across every replica.
BOILERPLATE = (
    "subscribe to our newsletter for updates terms of service privacy "
    "policy all rights reserved contact us about careers press blog "
    "help center community guidelines cookie preferences site map "
    "accessibility statement report a problem manage subscriptions"
)

_SKEW_SUFFIX = {None: "", "lang": "-skew", "boilerplate": "-skewbp"}


def _dst(replicas: int, skew: str | None = None) -> str:
    return os.path.join(BENCHDATA, f"sf{replicas / 10:g}" + _SKEW_SUFFIX[skew])


def build_replica(spark, replicas: int, skew: str | None = None) -> None:
    """``skew='lang'`` builds the adversarial-mixture variant (VERDICT
    r10 #5): every replica beyond the first is relabeled lang='en', so
    one language holds ~99% of documents at 100x — the worst case for
    any per-language window/sort. ``skew='boilerplate'`` (VERDICT r12
    #4) prepends a fixed boilerplate passage to ~30% of documents
    (doc_id %% 10 < 3) AFTER the per-replica permutation, so every
    boilerplate shingle / span W-gram is one content key shared by 30%
    of the corpus — the hot-key case the r12 min(struct)-election and
    df-join rewrites exist for."""
    dst = _dst(replicas, skew)
    os.makedirs(dst, exist_ok=True)
    for name in ("region", "nation", "supplier", "part"):
        table(spark, SRC, name).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    def replicate(name, offsets):
        base = table(spark, SRC, name)
        parts = []
        for r in range(replicas):
            df = base
            for col, step in offsets.items():
                df = df.withColumn(col, (F.col(col) + F.lit(r * step)).cast("long"))
            if name == "documents" and r:
                df = df.withColumn("text", F.translate(F.col("text"), ALPHA, _perm(r)))
                if skew == "lang":
                    df = df.withColumn("lang", F.lit("en"))
            if name == "documents" and skew == "boilerplate":
                df = df.withColumn(
                    "text",
                    F.when(
                        F.col("doc_id") % 10 < 3,
                        F.concat(F.lit(BOILERPLATE + " "), F.col("text")),
                    ).otherwise(F.col("text")),
                )
            if name == "embeddings" and r:
                rot = r % 64
                col = F.col("embedding")
                if rot:
                    col = F.concat(F.slice(col, rot + 1, 64 - rot), F.slice(col, 1, rot))
                if r >= 64:
                    col = F.transform(col, lambda x: -x)
                df = df.withColumn("embedding", col)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    replicate("customer", {"c_custkey": 1_000_000})
    replicate("orders", {"o_orderkey": 10_000_000, "o_custkey": 1_000_000})
    replicate("lineitem", {"l_orderkey": 10_000_000})
    replicate("documents", {"doc_id": 1_000_000})
    replicate("embeddings", {"vec_id": 1_000_000})
    # events: ts stays (windows scale by user count), users/event ids offset
    replicate("events", {"user_id": 1_000_000, "event_id": 100_000_000})


def main() -> None:
    args = sys.argv[1:]
    replicas = 10
    if "--replicas" in args:
        i = args.index("--replicas")
        replicas = int(args[i + 1])
        del args[i : i + 2]
    rebuild = "--rebuild" in args
    skew = None
    if "--skew-boilerplate" in args:
        skew = "boilerplate"
    elif "--skew" in args:
        skew = "lang"
    names = [a for a in args if not a.startswith("--")]
    if not names:
        if skew == "lang":
            # the per-language window/sort family — the shapes a
            # 99%-one-language corpus could serialize
            names = ["mixture_token_budget_sample", "stratified_sample"]
        elif skew == "boilerplate":
            # the content-keyed candidate/election family — the shapes
            # a 30%-shared-boilerplate corpus could serialize (VERDICT
            # r12 #4: the r12 window→join/aggregate rewrites)
            names = ["dedup_ngram_jaccard", "dedup_spans", "dedup_substrings"]
        else:
            names = WHALE_QUERIES if replicas >= 100 else DEFAULT_QUERIES

    dst = _dst(replicas)
    label = os.path.basename(dst)
    slack = replicas * 1.5

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if rebuild or not os.path.exists(f"{dst}/events.parquet"):
        print(f"building {label} replica ({replicas}x) ...", flush=True)
        build_replica(spark, replicas)
    if skew:
        sdst = _dst(replicas, skew=skew)
        if rebuild or not os.path.exists(f"{sdst}/events.parquet"):
            print(f"building {label}-{skew} replica ({replicas}x) ...", flush=True)
            build_replica(spark, replicas, skew=skew)

    import __spark_entry__ as entry

    from rustcheatersdatapipeline_spark.plans import analytics as _A
    from rustcheatersdatapipeline_spark.plans import queries as _Q
    from rustcheatersdatapipeline_spark.plans import retrieval as _R
    from rustcheatersdatapipeline_spark.plans import training as _T

    # the gate accepts tests-only operators too — new ops join the trend
    # check without touching the declared-50 surface
    qs = dict(entry.queries())
    for _m in (_T, _R, _A, _Q):
        qs.update(getattr(_m, "TESTS_ONLY_QUERIES", {}))
    if skew:
        # Skew gate: same data SHAPE, one key family made hot.
        # 'lang' (VERDICT r10 #5): one language holds ~99% of documents
        # — a per-language sort that serializes on the fat partition
        # shows up as a skew/uniform wall ratio far above 1.
        # 'boilerplate' (VERDICT r12 #4): one fixed passage shared by
        # 30% of documents — every one of its shingles/W-grams is a hot
        # content key; a content-keyed window would stall one task,
        # the r12 join/aggregate shapes must not. The gate allows 2x
        # for the residual fat-partition pre-aggregation (boilerplate
        # also adds ~+25 tokens to 30% of docs, so part of its ratio
        # is real extra volume, not skew).
        results = {}
        for name in names:
            fn = qs[name]
            times = {}
            # discarded warmup on the uniform corpus: the first query
            # of a session otherwise carries 10-20 s of JVM/codegen
            # warmup on the UNIFORM (first-timed) side, which deflates
            # the skew ratio — the gate-friendly direction, i.e. it
            # could hide a real skew stall (r13 review of the first
            # recorded run)
            fn(spark, dst).count()
            plan_cache.release(spark, dst)
            for lab, d in (("uniform", dst), ("skewed", _dst(replicas, skew))):
                t0 = time.time()
                n = fn(spark, d).count()
                times[lab] = round(time.time() - t0, 2)
                times[f"rows_{lab}"] = n
                # end-of-corpus eviction (plan_cache contract): without
                # it the uniform corpus's cached shingle/df/signature
                # tables stay pinned under the skewed corpus's timing
                plan_cache.release(spark, d)
            ratio = times["skewed"] / max(times["uniform"], 0.01)
            results[name] = {
                **times,
                "skew_ratio": round(ratio, 2),
                "skew_ok": ratio <= 2.0,
            }
            print(name, "->", json.dumps(results[name]), flush=True)
        bad = [k for k, v in results.items() if not v["skew_ok"]]
        print(
            json.dumps(
                {
                    "metric": "skew_gate",
                    "mode": skew,
                    "replicas": replicas,
                    "queries": results,
                    "serialized": bad,
                }
            )
        )
        return

    results = {}
    for name in names:
        fn = qs[name]
        times = {}
        for lab, sf_dir in (("sf0.1", SRC), (label, dst)):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            times[lab] = round(time.time() - t0, 2)
            times[f"rows_{lab}"] = n
            plan_cache.release(spark, sf_dir)
        ratio = times[label] / max(times["sf0.1"], 0.01)
        results[name] = {**times, "ratio": round(ratio, 1), "linear_ok": ratio <= slack}
        print(name, "->", json.dumps(results[name]), flush=True)

    bad = [k for k, v in results.items() if not v["linear_ok"]]
    print(
        json.dumps(
            {
                "metric": "scale_trend",
                "replicas": replicas,
                "queries": results,
                "superlinear": bad,
            }
        )
    )


if __name__ == "__main__":
    main()
