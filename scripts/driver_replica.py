"""Local replica of the driver's correctness gate: run queries() vs
oracle_sql() at a given sf dir and print per-query status.

Usage: python scripts/driver_replica.py [sf_dir] [query-name ...]
Defaults: sf0.01, all queries.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402
from helpers import assert_matches_oracle  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    spark = get_spark()
    ddb = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            ddb.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                assert_matches_oracle(df, ddb, oracles[name], name)
                results[name] = {"ok": True, "rows": df.count(), "sec": round(time.time() - t0, 2)}
            else:
                results[name] = {
                    "ok": "rows_only", "rows": df.count(), "sec": round(time.time() - t0, 2),
                }
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            results[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"[:300]}
        print(name, "->", json.dumps(results[name]), flush=True)
    bad = {k: v for k, v in results.items() if v.get("ok") is False}
    print(f"\n{len(results) - len(bad)}/{len(results)} green")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
