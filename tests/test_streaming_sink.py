"""foreachBatch merge sink: streaming events land in a gold parquet
table with latest-wins keys; replaying the same data is a no-op."""

import shutil

from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.streaming.sink import ParquetMergeSink

from .test_streaming import EVENTS_LONG_TS


def _run_stream(spark, events_dir, sink, checkpoint):
    src = (
        spark.readStream.schema(EVENTS_LONG_TS)
        .parquet(str(events_dir))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .select("user_id", "event_type", "ts", "value", "event_id")
    )
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_foreach_batch_merge_and_replay(spark, sf_dir, tmp_path):
    events_dir = tmp_path / "in"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "p0.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    gold = tmp_path / "gold_events"
    sink = ParquetMergeSink(
        spark, str(gold), keys=["user_id", "event_type"], order_by=["ts", "event_id"]
    )
    _run_stream(spark, events_dir, sink, tmp_path / "ckpt1")

    out1 = sorted(map(tuple, spark.read.parquet(str(gold)).collect()))
    distinct_keys = (
        spark.read.parquet(str(gold)).select("user_id", "event_type").distinct().count()
    )
    assert len(out1) == distinct_keys > 0  # keys collapsed latest-wins

    # replay the SAME input through a fresh checkpoint → table unchanged
    # except values may update to the same rows (idempotent merge)
    sink2 = ParquetMergeSink(
        spark, str(gold), keys=["user_id", "event_type"], order_by=["ts", "event_id"]
    )
    _run_stream(spark, events_dir, sink2, tmp_path / "ckpt2")
    out2 = sorted(map(tuple, spark.read.parquet(str(gold)).collect()))
    assert out2 == out1  # deterministic survivor → exact no-op replay
