"""Bench harness contract (SCALE.md r12 calibration protocol): the
driver records bench.py's one JSON line per round, and the 2x perf
gate is adjudicated through the calibration fields — so their presence
and arithmetic are part of the product surface, pinned here without
running the (minutes-long) full sweep."""

import statistics

import bench


def test_calibration_fields_and_arithmetic():
    """host_factor and normalized_value are pure functions of the probe
    readings and the fixed reference — replicate the arithmetic."""
    probes = [0.78, 0.45, 1.10, 0.62]
    factor = statistics.median(probes) / bench.CALIB_REF_SEC
    assert abs(factor - (0.70 / bench.CALIB_REF_SEC)) < 1e-12
    assert bench.CALIB_REF_SEC == 0.50  # the recorded r12 reference


def test_calibration_probe_is_fixed_size_and_deterministic():
    """The probe's workload constants are part of the ruler: changing
    them silently would make host_factor incomparable across rounds."""
    assert bench._CALIB_ROWS == 24_000_000
    assert bench._CALIB_PATH.startswith("/tmp/")


def test_calibration_probe_runs_and_times(spark):
    """End-to-end on the session: setup writes the deterministic table,
    the timed probe returns a positive wall reading, and two runs read
    within sane bounds of each other (min-of-5 stability)."""
    bench._calibration_setup(spark)
    a = bench._calibration_run(spark)
    b = bench._calibration_run(spark)
    assert a > 0 and b > 0
    assert max(a, b) / min(a, b) < 5  # same host, same table, same plan


def test_probe_table_content_is_a_pure_function_of_row_id(spark):
    """Regenerating the probe table yields identical aggregates — the
    ruler measures the host, never the data."""
    from pyspark.sql import functions as F

    bench._calibration_setup(spark)
    first = (
        spark.read.parquet(bench._CALIB_PATH)
        .agg(F.sum("k").alias("sk"), F.sum(F.abs("v")).alias("sv"),
             F.count("*").alias("n"))
        .first()
    )
    bench._calibration_setup(spark)
    second = (
        spark.read.parquet(bench._CALIB_PATH)
        .agg(F.sum("k").alias("sk"), F.sum(F.abs("v")).alias("sv"),
             F.count("*").alias("n"))
        .first()
    )
    assert first == second and first["n"] == bench._CALIB_ROWS
