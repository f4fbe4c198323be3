"""Structured Streaming equivalents of the reference's hourly micro-batch
semantics (SURVEY.md §2.7).

The reference's "streaming" is an Airflow schedule: one bounded pull per
hour (rust_twitter_steam_pipeline.py:46), tweets scoped to the interval
(helpers.py:35-39), idempotent upsert sinks tolerating replays
(sql_queries.py:30-31). The engine maps that to:

- a file/kafka ``readStream`` with a 1-hour tumbling ``window()``,
- a watermark for late data (the reference has none — its hourly
  interval filter simply drops late tweets; the watermark makes the
  same trade explicit and bounds state),
- ``foreachBatch`` + the warehouse upsert writers as the idempotent
  sink (D11/D12 are key-idempotent, so at-least-once delivery is safe —
  same argument as the reference's retry policy).

``hourly_event_counts`` is ONE transformation applied to either a batch
or a streaming DataFrame — the unbounded-table model guarantees
identical semantics, which the test verifies by comparing the
availableNow stream result to the batch result (Q28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """1-hour tumbling window counts (reference helpers.py:35-39 interval
    scoping, SURVEY.md §2.9 Q28). Works on batch and streaming frames."""
    return (
        events.groupBy(F.window(F.col("ts"), "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("h"), "cnt"
        )
    )


def stream_hourly_counts(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    ts_is_long_nanos: bool = False,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming variant: file source → watermark → tumbling window.

    The watermark bounds aggregation state (late events beyond it are
    dropped — the explicit version of the reference's interval cutoff).
    Trigger choice belongs to the caller: ``availableNow`` reproduces the
    reference's bounded hourly pull; ``processingTime='1 hour'`` is the
    continuous deployment.
    """
    src = spark.readStream.schema(schema).parquet(events_dir)
    if ts_is_long_nanos:
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return hourly_event_counts(src.withWatermark("ts", watermark))
