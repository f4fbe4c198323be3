"""Measure GoldStore.merge's cost contract: wall time tracks the
TOUCHED files + batch, not the table size.

Builds an append-published table of N single-file batches with disjoint
key ranges, then merges a constant 3-key source (touching exactly one
file) at growing table sizes. If merge were O(table), doubling N would
double the wall; the contract says it stays ~flat (candidate pruning is
metadata-only, the probe opens candidates only, the rewrite stages one
file's rows).

Also measures the strategy="mor" contract (VERDICT r8 #1): for a 1-row
upsert, BYTES WRITTEN must track rows touched, not files touched — the
copy-on-write rewrite of a whole 20k-row file vs a deletion vector plus
one inserted row.

Usage: python scripts/bench_merge.py [n_batches ...]   (default 8 32 128)
Prints one JSON line per size plus a summary ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402
from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore  # noqa: E402

ROWS_PER_BATCH = 20_000
KEY_STRIDE = 1_000_000


def build(spark, path: str, n_batches: int) -> GoldStore:
    store = GoldStore(spark, path)
    v = 0
    for b in range(n_batches):
        lo = b * KEY_STRIDE
        df = spark.range(lo, lo + ROWS_PER_BATCH).selectExpr(
            "id AS k", "concat('v', id) AS v"
        ).coalesce(1)
        v = store.publish_append({"t": df}, base_version=v)
    return store


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def measure_write_amplification(spark, d: str, n: int) -> dict:
    """1-row upsert: bytes written under cow vs mor."""
    out = {}
    for strategy in ("cow", "mor"):
        path = os.path.join(d, f"wa_{strategy}")
        store = build(spark, path, n)
        before = dir_bytes(path)
        src = spark.createDataFrame([(5, "X5")], "k bigint, v string").coalesce(1)
        t0 = time.time()
        store.merge("t", src, ["k"], strategy=strategy)
        out[strategy] = {
            "wall_s": round(time.time() - t0, 2),
            "bytes_written": dir_bytes(path) - before,
        }
    out["bytes_ratio_cow_over_mor"] = round(
        out["cow"]["bytes_written"] / max(out["mor"]["bytes_written"], 1), 1
    )
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [8, 32, 128]
    spark = get_spark(app_name="merge-bench")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n in sizes:
        d = tempfile.mkdtemp(prefix=f"mergebench{n}_")
        try:
            store = build(spark, d, n)
            src = spark.createDataFrame(
                [(5, "X5"), (6, "X6"), (99_999_999, "new")], "k bigint, v string"
            )
            t0 = time.time()
            store.merge("t", src, ["k"])
            wall = round(time.time() - t0, 2)
            entry = store.current_manifest()["tables"]["t"]
            carried = sum(
                1 for f in entry["files"] if "_data" in f["path"]
            )
            results[n] = {
                "wall_s": wall,
                "table_rows": n * ROWS_PER_BATCH,
                "files_after": carried,
            }
            print(json.dumps({"n_batches": n, **results[n]}), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    # write-amplification contract at the largest size
    d = tempfile.mkdtemp(prefix="mergewa_")
    try:
        wa = measure_write_amplification(spark, d, max(sizes))
        print(json.dumps({"metric": "merge_write_amplification_1row", **wa}),
              flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    ns = sorted(results)
    ratio = results[ns[-1]]["wall_s"] / max(results[ns[0]]["wall_s"], 0.01)
    size_ratio = ns[-1] / ns[0]
    print(
        json.dumps(
            {
                "metric": "merge_wall_vs_table_size",
                "size_ratio": size_ratio,
                "wall_ratio": round(ratio, 2),
                "flat_ok": ratio <= size_ratio / 4,
            }
        )
    )


if __name__ == "__main__":
    main()
