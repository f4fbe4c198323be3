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

Cold-invocation reps, r14 methodology (VERDICT r13 next-round #3).
Before r14, ``plan_cache.cached()`` intermediates (shingle/df/prefix/
signature/pair-set/CDC tables) and the sizing-scalar memos
(``choose_shingle_k``, ``_emb_count``) survived across reps, so reps
2..N of the near-dup/embed/LSH family skipped those builds and the
median was a warm-steady-state number — a cold invocation of e.g.
dedup_ngram_jaccard costs more than the r13-reported 2.09 s. Now
``_cold_reset`` (plan_cache.release + clear_session_memos) runs
BETWEEN reps, so every rep prices a cold invocation. For series
continuity the sweep ends with ONE extra warm pass over all queries
(no reset — reusing the last rep's intermediates exactly as the old
loop's reps 2+ did), reported as ``queries_warm_pass`` /
``value_warm_pass``: the old-methodology steady-state reading, NOT
part of the headline. ``queries_min`` / ``value_min`` additionally
report the per-query MIN over the cold reps (VERDICT r13 next-round
#8: medians still carry storm reps; min is the storm-robust
statistic — storms only ever add time). The driver-consumed fields
(``value``, ``queries``) keep their names; all new fields are
additions. NOTE for cross-round comparison: r14 ``value`` prices
cold invocations, so it is directly comparable to r13's ``value``
only through ``value_warm_pass`` (one warm sample per query) or the
per-query deltas of unaffected queries. None of the 10 ruler queries
touches a cross-rep cache or memo (verified: cached()/checkpointed()
consumers are the near-dup family; _emb_count consumers are
embed_neardup_cosine and the LSH queries), so the ruler references
and host-factor arithmetic are unchanged by the cold loop.

Host-weather calibration, r13 design (VERDICT r12 next-round #1).
Rounds 10-12 saw non-recovering ambient inflation of 1.25-1.9x on
UNTOUCHED plans (judge-reproduced), making a raw total hostage to its
host window; the r12 scan-shaped probe then failed its first live test
(probes 0.86x reference while untouched plans ran 1.25-1.4x). Measured
this session: NO single synthetic job shape tracks the sweep across
weather modes — under a controlled 20-process CPU slam a pure-overhead
probe inflated 3.1x and the 24M-row scan probe 1.5x while the sweep's
untouched-plan median moved 1.68x; in the r12 driver window the scan
probe read FASTER than reference while the sweep inflated. The ruler
that reproduces the judge's method by construction is the sweep
itself:

- **query ruler (primary)**: a FROZEN set of 10 declared queries
  spanning weight classes and families (trivial pushdown scan,
  timestamp formatting, 3-way join, window agg, decimal agg, rollup,
  text metrics x2, embedding compute, hash sampling). Each rep's
  host factor is the median of (this rep's time / clean-window
  reference) over the ruler queries — the same untouched-plan-median
  statistic the judge computes across rounds, sampled within the run
  (measured: ruler-10 median within 3.4% of the full-50 median under
  the CPU slam and within 2.5% across session windows). Zero extra
  wall time: the ruler queries are already in the sweep. The
  references are r12 protocol reading D (the best recorded window,
  scan factor 0.956) — host_factor 1.0 means "reference-class
  window", and ``normalized_value`` is directly comparable to the
  30-35 s readings recorded in that window class. CONSTRAINT: a code
  change to a ruler query's plan MUST re-record that reference in the
  same commit (tests pin the frozen set; scripts/validate_calibration.py
  cross-checks the ruler against the synthetic probes — a ruler/probe
  disagreement in a steady window means a ruler plan changed).
- **scan probe (diagnostic)**: the r12 24M-row parquet scan + hash
  aggregate, min of 5 — bulk IO+CPU throughput, comparable to r12
  files' host_factor.
- **job probe (diagnostic)**: 10 short multi-stage jobs (small scan
  -> filter -> groupBy shuffle -> orderBy/limit -> 16-row collect;
  median) — pure per-job overhead (scheduling, AQE planning, py4j),
  the mode the r12 window inflated. Job wall is insensitive to probe
  table size (measured 50k vs 400k rows within 5%), i.e. genuinely
  overhead-bound.

The two synthetic probes bracket every rep (before the sweep + after
each pass) because weather shifts WITHIN a run; their factors are
reported for diagnosis and cross-checking, NOT used for
normalization. Each rep's samples are normalized by that rep's own
query-ruler factor; ``normalized_value`` sums the per-query medians of
the normalized samples. The raw ``value`` stays the recorded headline
for continuity. All raw probe seconds are printed so any consumer can
re-derive factors against its own references; reference constants are
env-overridable (``SPARK_GRAFT_CALIB_REF`` scan,
``SPARK_GRAFT_CALIB_JOB_REF`` job, ``SPARK_GRAFT_CALIB_QUERY_REFS``
JSON dict for the query ruler — ADVICE r12: single-host constants).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


# Clean-window references. Scan: median of four min-of-5 readings in
# the best r12 window. Query ruler: r12 protocol reading D (raw
# 35.54 s, scan factor 0.956 — the best recorded window; per-query
# medians of reps=3). All ten ruler plans are untouched since r12, so
# reading D's values are valid r13 references. host_factor 1.0 ==
# reading-D-class window.
CALIB_REF_SEC = float(os.environ.get("SPARK_GRAFT_CALIB_REF", "0.50"))
CALIB_JOB_REF_SEC = float(os.environ.get("SPARK_GRAFT_CALIB_JOB_REF", "0.26"))

_DEFAULT_QUERY_REFS = {
    "q3": 0.1701,
    "q9": 0.406,
    "q15": 0.4564,
    "q20": 0.1828,
    "q27": 0.6193,
    "events_rollup": 0.3172,
    "corpus_stats": 0.6105,
    # re-recorded r14 in the SAME commit as the text_metrics plan change
    # (split bound once; docstring CONSTRAINT): old ref 1.063 scaled by
    # the median interleaved-A/B min ratio over three sf0.1 sessions
    # (old/new = 1.033; sessions read 0.93/1.14/1.03 — the win grows to
    # 1.14x at the 100x replica where compute dominates overhead)
    "text_metrics": 1.029,
    "ann_ivf_assign": 0.6273,
    "stratified_sample": 0.2197,
}
CALIB_QUERY_REFS: dict[str, float] = (
    json.loads(os.environ["SPARK_GRAFT_CALIB_QUERY_REFS"])
    if "SPARK_GRAFT_CALIB_QUERY_REFS" in os.environ
    else _DEFAULT_QUERY_REFS
)

_CALIB_ROWS = 24_000_000
_CALIB_PATH = "/tmp/spark_graft_calib.parquet"
_JOB_ROWS = 50_000
_JOB_PATH = "/tmp/spark_graft_calib_jobs.parquet"
_JOB_BATTERY = 10


def _calibration_setup(spark) -> None:
    """Write the deterministic probe tables (UNTIMED; same bytes every
    run — content is a pure function of row id)."""
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
    (
        spark.range(0, _JOB_ROWS, 1, 4)
        .select(
            F.col("id"),
            (F.col("id") % 1009).alias("k"),
            (F.hash(F.col("id").cast("string")).cast("double") / 1e9).alias("v"),
        )
        .write.mode("overwrite")
        .parquet(_JOB_PATH)
    )


def _scan_probe_once(spark) -> float:
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


def _scan_probe(spark) -> float:
    """Bulk-throughput probe: fixed-size parquet scan + hash aggregation
    to a noop sink, whole-stage codegen, one shuffle. MIN of 5 single
    runs: the floor is the host's attainable speed (scheduler jitter
    and GC only ever ADD time); single-shot readings showed a 1.6x
    spread."""
    return min(_scan_probe_once(spark) for _ in range(5))


def _job_probe_once(spark, i: int) -> float:
    """One short multi-stage job: scan -> filter -> groupBy shuffle ->
    orderBy/limit -> 16-row collect. The per-job constant (~0.26 s) is
    dominated by scheduling/AQE/py4j overhead, not data. ``i`` varies
    the filter/keying so no plan- or shuffle-level reuse is possible."""
    t0 = time.perf_counter()
    (
        spark.read.parquet(_JOB_PATH)
        .filter(F.col("id") % 10 == F.lit(i % 10))
        .groupBy(((F.col("k") + F.lit(i)) % 97).alias("g"))
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .orderBy("g")
        .limit(16)
        .collect()
    )
    return time.perf_counter() - t0


def _job_probe(spark) -> float:
    """Median job wall over a battery of _JOB_BATTERY jobs (median, not
    min: overhead contention is a shift, and a single GC stall should
    not poison the battery)."""
    return statistics.median(
        _job_probe_once(spark, i) for i in range(_JOB_BATTERY)
    )


def _cold_reset(spark, sf_dir: str) -> int:
    """Drop every cross-invocation intermediate so the next rep prices
    a COLD query invocation: release the plan-cache registry's handles
    (cached shingle/signature/pair tables, registry-owned checkpoints)
    and the sizing-scalar memos (shingle k, embedding count). Returns
    the number of plan-cache handles released (0 when nothing was
    registered — e.g. between reps of a subset sweep that never builds
    them)."""
    from rustcheatersdatapipeline_spark import plan_cache
    from rustcheatersdatapipeline_spark.plans import training as _tr

    n = plan_cache.release(spark, sf_dir)
    _tr.clear_session_memos(spark, sf_dir)
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # dedup_spans rotated out of the declared surface in r13 (its slot
    # holds the strictly-stronger dedup_substrings; the builder stays
    # oracle-checked in the tests-only suite). The bench contract says
    # entries may be ADDED but never removed, so keep timing it as an
    # extra `queries` entry for cross-round continuity — it is NOT part
    # of the declared surface and is EXCLUDED from `value`.
    from rustcheatersdatapipeline_spark.plans import training as _training

    declared = set(qs)
    qs = dict(qs)
    qs["dedup_spans"] = _training.TESTS_ONLY_QUERIES["dedup_spans"]
    # warm-up: JVM, codegen, parquet footer caches
    qs["q25"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # warm-up the Python worker pool too, or the first Arrow-path query
    # (multimodal_features) gets billed ~3 s of worker spin-up
    qs["multimodal_features"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # synthetic probes: setup (untimed) + one full warm-up pass each so
    # codegen/JIT warming is not billed to the first reading; then one
    # reading at every rep boundary (weather shifts WITHIN a run)
    _calibration_setup(spark)
    _scan_probe(spark)
    _job_probe(spark)
    scan_probes = [_scan_probe(spark)]
    job_probes = [_job_probe(spark)]

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in qs}
    for r in range(reps):
        if r:
            # r14 cold-invocation loop: rep 1 starts cold on a fresh
            # session; resetting between reps makes every later rep
            # cold too (module docstring, VERDICT r13 #3)
            _cold_reset(spark, sf_dir)
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
        scan_probes.append(_scan_probe(spark))
        job_probes.append(_job_probe(spark))

    # ONE warm continuity pass (no reset): the last rep's cached
    # intermediates/memos are still live, so this pass reads the
    # pre-r14 loop's steady state — the number comparable to r13's
    # medians. Diagnostic only; excluded from `value`.
    warm_pass: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm_pass[name] = round(time.perf_counter() - t0, 4)

    # primary ruler: per-rep untouched-plan median over the frozen
    # query set, each rep normalized by ITS OWN factor (at sf!=0.1 the
    # references do not apply: factors degrade to 1.0 and the
    # calibration block says so)
    ruler_ok = abs(sf - 0.1) < 1e-9 and all(
        q in samples for q in CALIB_QUERY_REFS
    )
    if ruler_ok:
        query_factors = [
            statistics.median(
                samples[q][r] / CALIB_QUERY_REFS[q] for q in CALIB_QUERY_REFS
            )
            for r in range(reps)
        ]
    else:
        query_factors = [1.0] * reps
    host_factor = statistics.median(query_factors)

    # diagnostics: bracket factors from the synthetic probes
    job_factors = [
        (job_probes[r] + job_probes[r + 1]) / 2.0 / CALIB_JOB_REF_SEC
        for r in range(reps)
    ]
    scan_factors = [
        (scan_probes[r] + scan_probes[r + 1]) / 2.0 / CALIB_REF_SEC
        for r in range(reps)
    ]

    timings = {name: round(statistics.median(ts), 4) for name, ts in samples.items()}
    # `value` sums the DECLARED surface only (the driver's gate); the
    # continuity extras (dedup_spans) are reported per-query but not
    # added to the headline, which would otherwise double-count the
    # rotated slot against every earlier round.
    total = round(sum(v for k, v in timings.items() if k in declared), 4)
    timings_min = {name: round(min(ts), 4) for name, ts in samples.items()}
    total_min = round(sum(v for k, v in timings_min.items() if k in declared), 4)
    total_warm = round(sum(v for k, v in warm_pass.items() if k in declared), 4)
    norm_timings = {
        name: statistics.median(t / query_factors[r] for r, t in enumerate(ts))
        for name, ts in samples.items()
    }
    normalized_value = round(
        sum(v for k, v in norm_timings.items() if k in declared), 4
    )
    print(
        json.dumps(
            {
                "metric": "declared_query_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_min": timings_min,
                "value_min": total_min,
                "queries_warm_pass": warm_pass,
                "value_warm_pass": total_warm,
                "sf": sf,
                "calibration": {
                    "query_ruler": sorted(CALIB_QUERY_REFS),
                    "query_ruler_valid": ruler_ok,
                    "query_factors_per_rep": [round(f, 3) for f in query_factors],
                    "scan_probe_secs": [round(p, 4) for p in scan_probes],
                    "scan_ref_sec": CALIB_REF_SEC,
                    "scan_factor": round(statistics.median(scan_factors), 3),
                    "job_probe_secs": [round(p, 4) for p in job_probes],
                    "job_ref_sec": CALIB_JOB_REF_SEC,
                    "job_factor": round(statistics.median(job_factors), 3),
                    "host_factor": round(host_factor, 3),
                    "normalized_value": normalized_value,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
