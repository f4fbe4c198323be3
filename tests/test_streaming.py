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
