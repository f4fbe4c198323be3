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
from pyspark.sql.types import LongType, StructType


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


def events_stream_schema(
    spark: SparkSession, events_dir: str
) -> tuple[StructType, bool]:
    """Probe the events files' actual schema with a (lazy, metadata-only)
    batch read — the streaming twin of ``catalog.table``'s dtype probe.

    Returns (schema, ts_is_long_nanos). Historically the driver wrote
    ``ts`` as parquet TIMESTAMP(NANOS) (readable only as raw longs via
    the ``nanosAsLong`` conf); it now writes TIMESTAMP(MICROS), which is
    Spark-native. Hardcoding either assumption mis-times every event by
    1000× when the file format flips, so the unit is always probed.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_dir).schema
    ts_is_long = any(
        f.name == "ts" and isinstance(f.dataType, LongType) for f in schema.fields
    )
    return schema, ts_is_long


def open_events_stream(
    spark: SparkSession, events_dir: str, schema: StructType | None = None
) -> DataFrame:
    """File-source readStream over the events table with ``ts`` normalized
    to TimestampType(micros) regardless of the on-disk unit.

    If ``schema`` is omitted it is probed from the files; if supplied, a
    LongType ``ts`` field is taken to mean raw nanos (the legacy layout)
    and converted, a TimestampType ``ts`` is used as-is.
    """
    if schema is None:
        schema, _ = events_stream_schema(spark, events_dir)
    ts_is_long = any(
        f.name == "ts" and isinstance(f.dataType, LongType) for f in schema.fields
    )
    src = spark.readStream.schema(schema).parquet(events_dir)
    if ts_is_long:
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(src.dtypes).get("ts") == "timestamp_ntz":
        # parquet isAdjustedToUTC=false infers NTZ, which watermarks reject
        # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); session tz is pinned UTC
        # (catalog._ensure_session_confs) so the cast is value-preserving.
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return src


def stream_hourly_counts(
    spark: SparkSession,
    events_dir: str,
    schema: StructType | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming variant: file source → watermark → tumbling window.

    The watermark bounds aggregation state (late events beyond it are
    dropped — the explicit version of the reference's interval cutoff).
    Trigger choice belongs to the caller: ``availableNow`` reproduces the
    reference's bounded hourly pull; ``processingTime='1 hour'`` is the
    continuous deployment.
    """
    src = open_events_stream(spark, events_dir, schema)
    return hourly_event_counts(src.withWatermark("ts", watermark))
