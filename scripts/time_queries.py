"""Focused per-query timing: median/min of N noop-sink runs at sf0.1.

Usage: python scripts/time_queries.py q1 dedup_substrings ... [--reps N] [--cold]
Same methodology as bench.py (builder + noop save timed, warm session),
for the optimization loop only — the headline number stays bench.py's.
``--cold`` resets the plan-cache registry and sizing-scalar memos
before every rep, matching the r14 bench loop's cold-invocation
pricing (bench._cold_reset); without it reps 2+ reuse cached
intermediates like the trailing warm continuity pass does.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    cold = "--cold" in sys.argv[1:]
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entry.queries())
    from rustcheatersdatapipeline_spark.plans import training as _tr

    qs.update(_tr.TESTS_ONLY_QUERIES)
    # warm-up
    qs["q25"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs["multimodal_features"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {n: [] for n in args}
    for _ in range(reps):
        if cold:
            import bench

            bench._cold_reset(spark, sf_dir)
        for name in args:
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for name, ts in samples.items():
        print(
            f"{name:32s} med={statistics.median(ts):.3f} min={min(ts):.3f} "
            f"all={[round(t, 3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
