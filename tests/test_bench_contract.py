"""Bench harness contract (SCALE.md calibration protocol, r13 form):
the driver records bench.py's one JSON line per round, and the 2x perf
gate is adjudicated through the calibration fields — so their presence
and arithmetic are part of the product surface, pinned here without
running the (minutes-long) full sweep."""

import statistics

import bench


def test_query_ruler_is_frozen_and_declared():
    """The query ruler is the PRIMARY host factor: its member set and
    references are ruler constants — changing a member's plan without
    re-recording its reference in the same commit breaks cross-round
    comparability (bench.py module docstring CONSTRAINT)."""
    import __spark_entry__ as entry

    expected = {
        "q3",
        "q9",
        "q15",
        "q20",
        "q27",
        "events_rollup",
        "corpus_stats",
        "text_metrics",
        "ann_ivf_assign",
        "stratified_sample",
    }
    assert set(bench.CALIB_QUERY_REFS) == expected
    assert expected <= set(entry.queries())
    assert all(v > 0 for v in bench.CALIB_QUERY_REFS.values())


def test_per_rep_factor_arithmetic():
    """host_factor is the median over reps of each rep's own
    untouched-plan median vs the frozen references — replicate the
    arithmetic on synthetic samples (rep 2 runs in a 2x window)."""
    refs = bench.CALIB_QUERY_REFS
    samples = {q: [ref, 2.0 * ref] for q, ref in refs.items()}
    factors = [
        statistics.median(samples[q][r] / refs[q] for q in refs)
        for r in range(2)
    ]
    assert factors == [1.0, 2.0]
    assert statistics.median(factors) == 1.5
    # per-rep normalization recovers the clean reading in BOTH reps
    norm = {
        q: statistics.median(t / factors[r] for r, t in enumerate(ts))
        for q, ts in samples.items()
    }
    assert all(abs(norm[q] - refs[q]) < 1e-12 for q in refs)


def test_probe_constants_are_fixed():
    """The synthetic probes' workload constants are part of the ruler:
    changing them silently would make scan/job factors incomparable
    across rounds."""
    import os

    assert bench._CALIB_ROWS == 24_000_000
    assert bench._CALIB_PATH.startswith("/tmp/")
    assert bench._JOB_ROWS == 50_000
    assert bench._JOB_BATTERY == 10
    # the reference is legitimately env-overridable (ADVICE r12) — pin
    # the DEFAULT literal, not the env-resolved module constant, so a
    # recalibrated host doesn't fail the contract test (r13 review)
    expected = float(os.environ.get("SPARK_GRAFT_CALIB_REF", "0.50"))
    assert bench.CALIB_REF_SEC == expected


def test_cold_reset_releases_handles_and_memos(spark, sf_dir):
    """r14 methodology (VERDICT r13 #3): the rep loop resets every
    cross-invocation intermediate between reps — plan-cache handles AND
    the sizing-scalar memos — so per-query medians price a cold
    invocation, not warm-cache steady state."""
    from rustcheatersdatapipeline_spark import plan_cache
    from rustcheatersdatapipeline_spark.plans import training as tr

    df = plan_cache.cached(
        spark, sf_dir, "bench_cold_reset_probe", lambda: spark.range(4)
    )
    df.count()
    tr.choose_shingle_k(spark, sf_dir)
    tr._emb_count(spark, sf_dir)
    assert plan_cache.registered(spark, sf_dir)
    assert any(k == (id(spark), sf_dir) for k in tr._SHINGLE_K_CACHE)
    emb_memo = getattr(spark, tr._EMB_COUNT_ATTR)
    assert any(k[0] == f"{sf_dir}/embeddings.parquet" for k in emb_memo)

    released = bench._cold_reset(spark, sf_dir)

    assert released >= 1
    assert plan_cache.registered(spark, sf_dir) == []
    assert not any(k == (id(spark), sf_dir) for k in tr._SHINGLE_K_CACHE)
    assert not any(k[0] == f"{sf_dir}/embeddings.parquet" for k in emb_memo)


def test_clear_session_memos_scopes_to_sf_dir():
    """clear_session_memos(sf_dir) must not evict another corpus's
    memoized scalars (a multi-corpus session sweeps several sf dirs)."""
    from rustcheatersdatapipeline_spark.plans import training as tr

    class FakeSession:
        pass

    s = FakeSession()
    tr._SHINGLE_K_CACHE[(id(s), "/corpus/a")] = 3
    tr._SHINGLE_K_CACHE[(id(s), "/corpus/b")] = 4
    setattr(
        s,
        tr._EMB_COUNT_ATTR,
        {
            ("/corpus/a/embeddings.parquet", 1, 1): 10,
            ("/corpus/b/embeddings.parquet", 1, 1): 20,
        },
    )
    try:
        tr.clear_session_memos(s, "/corpus/a")
        assert (id(s), "/corpus/a") not in tr._SHINGLE_K_CACHE
        assert tr._SHINGLE_K_CACHE[(id(s), "/corpus/b")] == 4
        memo = getattr(s, tr._EMB_COUNT_ATTR)
        assert list(memo.values()) == [20]
        tr.clear_session_memos(s)  # None = all corpora
        assert (id(s), "/corpus/b") not in tr._SHINGLE_K_CACHE
        assert memo == {}
    finally:
        for k in [k for k in tr._SHINGLE_K_CACHE if k[0] == id(s)]:
            del tr._SHINGLE_K_CACHE[k]


def test_probes_run_and_time(spark):
    """End-to-end on the session: setup writes the deterministic
    tables, both probes return positive wall readings, and repeat runs
    read within sane bounds of each other."""
    bench._calibration_setup(spark)
    a = bench._scan_probe(spark)
    b = bench._scan_probe(spark)
    assert a > 0 and b > 0
    assert max(a, b) / min(a, b) < 5  # same host, same table, same plan
    j1 = bench._job_probe(spark)
    j2 = bench._job_probe(spark)
    assert j1 > 0 and j2 > 0
    assert max(j1, j2) / min(j1, j2) < 5


def test_probe_table_content_is_a_pure_function_of_row_id(spark):
    """Regenerating the probe tables yields identical aggregates — the
    ruler measures the host, never the data."""
    from pyspark.sql import functions as F

    def snap():
        bench._calibration_setup(spark)
        big = (
            spark.read.parquet(bench._CALIB_PATH)
            .agg(
                F.sum("k").alias("sk"),
                F.sum(F.abs("v")).alias("sv"),
                F.count("*").alias("n"),
            )
            .first()
        )
        small = (
            spark.read.parquet(bench._JOB_PATH)
            .agg(
                F.sum("k").alias("sk"),
                F.sum(F.abs("v")).alias("sv"),
                F.count("*").alias("n"),
            )
            .first()
        )
        return big, small

    first, second = snap(), snap()
    assert first == second
    assert first[0]["n"] == bench._CALIB_ROWS
    assert first[1]["n"] == bench._JOB_ROWS
