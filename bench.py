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

Host-weather calibration (VERDICT r11 next-round #1): rounds 10-12 saw
non-recovering ambient inflation of 1.4-1.6x on UNTOUCHED plans (judge-
reproduced), which makes a raw total hostage to the host window it was
taken in. The bench therefore times a FIXED synthetic probe — a
deterministic 24M-row parquet scan + hash aggregation whose size never
varies with SF or the declared surface — immediately before and after
the query sweep, and prints::

    "calibration": {"before_sec": s, "after_sec": s, "ref_sec": R,
                    "host_factor": median(before, after) / R}

``ref_sec`` is the recorded clean-window reference (SCALE.md r12
protocol reading). Any total can be normalized as
``value / host_factor`` for cross-round comparison; a driver reading
taken in a bad window is now explainable rather than a silent
regression. The probe itself is pure built-in codegen (range ->
parquet -> groupBy/agg -> noop), so it scales with host CPU/IO state
exactly like the declared sweep does.
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


# Clean-window reference for the calibration probe (seconds). Recorded
# per SCALE.md "r12 calibration protocol": median of four min-of-5
# probe readings in the r12 session window (0.499/0.504/0.465/0.565).
# host_factor = 1.0 means "host as fast as the reference window"; a
# bad window reads >1 and `value / host_factor` is the comparable
# number. See SCALE.md "Calibration protocol (r12)".
CALIB_REF_SEC = 0.50

_CALIB_ROWS = 24_000_000
_CALIB_PATH = "/tmp/spark_graft_calib.parquet"


def _calibration_setup(spark) -> None:
    """Write the deterministic probe table (UNTIMED; same bytes every
    run — content is a pure function of row id)."""
    from pyspark.sql import functions as F

    (
        spark.range(0, _CALIB_ROWS, 1, 32)
        .select(
            F.col("id"),
            (F.col("id") % 997).alias("k"),
            (F.hash(F.col("id").cast("string")).cast("double") / 1e9).alias("v"),
        )
        .write.mode("overwrite")
        .parquet(_CALIB_PATH)
    )


def _calibration_once(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.read.parquet(_CALIB_PATH)
        .groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("*").alias("c"),
            F.avg(F.col("v") * F.col("v")).alias("m2"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def _calibration_run(spark) -> float:
    """The TIMED probe: fixed-size parquet scan + hash aggregation to a
    noop sink. Whole-stage codegen end-to-end, one shuffle — the same
    resource mix (IO + CPU + shuffle) the declared sweep exercises.
    MIN of 5 single runs: the probe's floor is the host's attainable
    speed (scheduler jitter and GC only ever ADD time), and ambient
    neighbor contention — the thing we are detecting — inflates the
    floor itself. Single-shot readings showed a 1.6x spread and a
    JIT-warming drift; the min is stable against both."""
    return min(_calibration_once(spark) for _ in range(5))


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

    # calibration probe: setup (untimed) + one warm-up pass so codegen
    # compilation is not billed to the first reading. Probes interleave
    # with the reps (before the sweep + after every pass) because host
    # weather shifts WITHIN a run — the r12 protocol reading saw the
    # before-probe at 1.56x ref while the after-probe sat at ref, with
    # the query inflation tracking the probe taken DURING the sweep.
    _calibration_setup(spark)
    _calibration_run(spark)
    probes = [_calibration_run(spark)]

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in qs}
    for _ in range(reps):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
        probes.append(_calibration_run(spark))

    host_factor = statistics.median(probes) / CALIB_REF_SEC

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
                "calibration": {
                    "probe_secs": [round(p, 4) for p in probes],
                    "ref_sec": CALIB_REF_SEC,
                    "host_factor": round(host_factor, 3),
                    "normalized_value": round(total / host_factor, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
