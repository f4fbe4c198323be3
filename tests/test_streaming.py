"""Streaming-vs-batch equivalence (SURVEY.md §2.7): the same tumbling
window over the events table must produce identical results through
readStream(availableNow) and the batch path."""

import shutil

from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.streaming import (
    hourly_event_counts,
    stream_hourly_counts,
)


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    # no schema / unit hint: stream_hourly_counts probes the files' actual
    # ts dtype (nanos-long vs native timestamp), like catalog.table does
    stream_df = stream_hourly_counts(spark, str(events_dir))
    q = (
        stream_df.writeStream.format("memory")
        .queryName("hourly_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.sql("SELECT h, cnt FROM hourly_counts").collect()))
    want = sorted(map(tuple, hourly_event_counts(table(spark, sf_dir, "events")).collect()))
    assert got == want and len(got) > 0


def test_sliding_window_stream_equals_batch(spark, sf_dir, tmp_path):
    """The sliding-window agg is one transformation on the unbounded
    table: readStream(availableNow) through the same expression equals
    the batch result (same §2.7 argument as the tumbling case)."""
    import shutil

    from pyspark.sql import functions as F

    from rustcheatersdatapipeline_spark.plans.analytics import events_sliding_counts
    from rustcheatersdatapipeline_spark.streaming import open_events_stream

    events_dir = tmp_path / "ev_slide"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "p0.parquet")

    # exact count_distinct is batch-only in Spark streaming; the stream
    # parity claim is about the WINDOW ASSIGNMENT, so compare counts
    stream_df = (
        open_events_stream(spark, str(events_dir))
        .withWatermark("ts", "3 hours")
        .groupBy(F.window(F.col("ts"), "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("h_start"),
            "cnt",
        )
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("sliding_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.sql("SELECT h_start, cnt FROM sliding_counts").collect()))
    want = sorted(
        map(tuple, events_sliding_counts(spark, sf_dir).select("h_start", "cnt").collect())
    )
    assert got == want and len(got) > 0


def test_events_stream_unit_probe(spark, tmp_path):
    """Regression (r4): the driver's events.parquet flipped from
    TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and a hardcoded nanos branch
    shifted every event to 1970. The probe must normalize BOTH layouts
    to the same TimestampType values."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rustcheatersdatapipeline_spark.streaming import (
        events_stream_schema,
        open_events_stream,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 34, 56)
    times = [t0, t0 + datetime.timedelta(hours=1)]
    for unit, sub in (("us", "micros"), ("ns", "nanos")):
        d = tmp_path / sub
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(times, pa.timestamp(unit)),
                "user_id": pa.array([7, 7], pa.int64()),
            }
        )
        pq.write_table(tbl, d / "p0.parquet", coerce_timestamps=None)

    micros_schema, micros_is_long = events_stream_schema(spark, str(tmp_path / "micros"))
    nanos_schema, nanos_is_long = events_stream_schema(spark, str(tmp_path / "nanos"))
    assert not micros_is_long
    assert nanos_is_long  # nanosAsLong conf surfaces ns as raw longs

    def run(sub, name):
        q = (
            open_events_stream(spark, str(tmp_path / sub))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return sorted(
            (r["event_id"], r["ts"], r["user_id"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )

    got_us = run("micros", "probe_us")
    got_ns = run("nanos", "probe_ns")
    assert got_us == got_ns == [(1, times[0], 7), (2, times[1], 7)]


def test_watermark_drops_late_events(spark, tmp_path):
    """§2.7 late-data contract: an event arriving behind the watermark
    must NOT re-open its (already finalized) window — the explicit form
    of the reference's hourly interval cutoff. Two availableNow runs
    over one checkpoint: run 1 advances the watermark past the 00:00
    window and finalizes it; run 2 delivers a late 00:30 event (dropped)
    plus a fresh 05:10 event (counted)."""
    import datetime

    from pyspark.sql.types import TimestampType

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
        ]
    )
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_batch(fname, rows):
        spark.createDataFrame(
            [(i, datetime.datetime(2022, 3, 1, h, m), 1) for i, (h, m) in enumerate(rows)],
            schema,
        ).coalesce(1).write.mode("overwrite").parquet(str(src / fname))

    def run_once():
        q = (
            stream_hourly_counts(spark, f"{src}/*", schema, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: events at 00:10, 00:20, 02:50 → watermark 01:50, the
    # 00:00-01:00 window (cnt 2) finalizes and emits
    write_batch("b1", [(0, 10), (0, 20), (2, 50)])
    run_once()
    # run 2: 00:30 is behind the persisted watermark → dropped;
    # 05:10 advances the watermark to 04:10 → 02:00 window emits
    write_batch("b2", [(0, 30), (5, 10)])
    run_once()

    got = {
        r["h"]: r["cnt"] for r in spark.read.parquet(str(out)).collect()
    }
    assert got["2022-03-01 00:00:00"] == 2  # late 00:30 NOT re-counted
    assert got["2022-03-01 02:00:00"] == 1
