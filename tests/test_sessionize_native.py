"""Native session_window sessionization (streaming/ops.py
sessionize_native) must agree with the lag+running-sum batch plan —
three independent sessionizer implementations, one session set."""

import shutil

from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.plans.analytics import events_sessionize
from rustcheatersdatapipeline_spark.streaming import (
    open_events_stream,
    sessionize_native,
)


def _no_exact_gap_boundary(spark, sf_dir):
    """The two closure rules differ only for inter-event gaps of exactly
    30:00.000000 — assert the test data has none, so equality below is
    a real check, not luck."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))).alias("gap_us")
    )
    assert gaps.filter(F.col("gap_us") == 30 * 60 * 1_000_000).count() == 0


def test_native_equals_lag_plan_batch(spark, sf_dir):
    _no_exact_gap_boundary(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    got = sorted(map(tuple, sessionize_native(ev).collect()))
    want = sorted(
        map(
            tuple,
            events_sessionize(spark, sf_dir)
            .select("user_id", "session_start", "session_end", "n_events")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_native_sessionize_stream_equals_batch(spark, sf_dir, tmp_path):
    events_dir = tmp_path / "ev"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "p0.parquet")

    stream = open_events_stream(spark, str(events_dir))
    q = (
        sessionize_native(stream)
        .writeStream.format("memory")
        .queryName("native_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM native_sessions").collect())
    )
    want = sorted(map(tuple, sessionize_native(table(spark, sf_dir, "events")).collect()))
    assert got == want and len(got) > 0
