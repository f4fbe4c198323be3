"""Benchmark harness (driver contract).

Runs every declared query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "declared_query_wall", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan + execute) against a ``noop`` sink so
we measure distributed execution, not driver-side result transfer. A
warm-up query runs first so JVM/codegen startup is not billed to q1.

Per-query time is the MEDIAN of ``$SPARK_GRAFT_BENCH_REPS`` (default 3)
runs; single-shot timing produced 2-5x phantom swings on untouched plans
between rounds (VERDICT r4 finding 3), which made the regression gate
meaningless. Reps interleave (all queries pass 1, then pass 2, ...) so a
transient GC/compilation stall hits one rep of many queries instead of
all reps of one.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # warm-up: JVM, codegen, parquet footer caches
    qs["q25"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # warm-up the Python worker pool too, or the first Arrow-path query
    # (multimodal_features) gets billed ~3 s of worker spin-up
    qs["multimodal_features"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in qs}
    for _ in range(reps):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)

    timings = {name: round(statistics.median(ts), 4) for name, ts in samples.items()}
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_query_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
