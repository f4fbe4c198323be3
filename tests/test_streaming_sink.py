"""foreachBatch merge sink: streaming events land in a gold parquet
table with latest-wins keys; replaying the same data is a no-op."""

import shutil

from rustcheatersdatapipeline_spark.streaming import open_events_stream
from rustcheatersdatapipeline_spark.streaming.sink import ParquetMergeSink


def _run_stream(spark, events_dir, sink, checkpoint):
    src = open_events_stream(spark, str(events_dir)).select(
        "user_id", "event_type", "ts", "value", "event_id"
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


def test_stream_source_to_gold_end_to_end(spark, tmp_path):
    """The reference's hourly DAG as a continuous stream: capture files
    → streaming DataSource V2 → foreachBatch merge into gold. Two
    incremental runs build the table; wiping the checkpoint and
    replaying EVERYTHING from offset zero converges to the same gold
    state (at-least-once delivery + key-idempotent merge = effective
    exactly-once)."""
    import json
    import shutil

    from rustcheatersdatapipeline_spark.sources.datasource import (
        TwitterTimelineDataSource,
    )
    from rustcheatersdatapipeline_spark.streaming.sink import ParquetMergeSink

    cap, gold, ckpt = tmp_path / "cap", tmp_path / "gold", tmp_path / "ckpt"
    cap.mkdir()
    spark.dataSource.register(TwitterTimelineDataSource)

    def capture(name, url, t):
        return {
            "steam_profile_urls": [
                {
                    "profile_name_at_ban": name,
                    "profile_url": url,
                    "tweet_created_time": t,
                }
            ]
        }

    sink = ParquetMergeSink(
        spark,
        str(gold),
        keys=["profile_url"],
        order_by=["tweet_created_time"],
        mode="update",
    )

    def run_once():
        q = (
            spark.readStream.format("twitter_timeline")
            .option("dir", str(cap))
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    u1 = "http://steamcommunity.com/profiles/76561198000000001/"
    u2 = "http://steamcommunity.com/profiles/76561198000000002/"
    (cap / "h11.json").write_text(json.dumps(capture("old_name", u1, "2022-01-15T11:00:00Z")))
    run_once()
    # hour 2: u1 re-banned under a new name (latest-wins) + a new profile
    (cap / "h12.json").write_text(json.dumps(capture("new_name", u1, "2022-01-15T12:00:00Z")))
    (cap / "h13.json").write_text(json.dumps(capture("other", u2, "2022-01-15T12:30:00Z")))
    run_once()

    want = {
        (u1, "new_name", "2022-01-15T12:00:00Z"),
        (u2, "other", "2022-01-15T12:30:00Z"),
    }
    got = {
        (r["profile_url"], r["profile_name_at_ban"], r["tweet_created_time"])
        for r in spark.read.parquet(str(gold)).collect()
    }
    assert got == want

    # wipe the checkpoint → full replay from offset zero → same state
    shutil.rmtree(ckpt)
    run_once()
    got2 = {
        (r["profile_url"], r["profile_name_at_ban"], r["tweet_created_time"])
        for r in spark.read.parquet(str(gold)).collect()
    }
    assert got2 == want
