"""Streaming-vs-batch equivalence (SURVEY.md §2.7): the same tumbling
window over the events table must produce identical results through
readStream(availableNow) and the batch path."""

import shutil

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.streaming import (
    hourly_event_counts,
    stream_hourly_counts,
)

EVENTS_LONG_TS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # nanos (see catalog nanos handling)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream_df = stream_hourly_counts(
        spark, str(events_dir), EVENTS_LONG_TS, ts_is_long_nanos=True
    )
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
