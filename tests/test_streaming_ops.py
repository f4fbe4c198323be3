"""Streaming dedup + stream-stream interval join (SURVEY.md §2.7
extensions, rustcheatersdatapipeline_spark/streaming/ops.py)."""

import datetime
import shutil

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.streaming import (
    click_purchase_pairs,
    dedup_within_watermark,
    open_events_stream,
    stream_click_attribution,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
    ]
)


def _ts(h, m):
    return datetime.datetime(2024, 3, 1, h, m)


def test_stream_dedup_drops_replayed_events(spark, tmp_path):
    """At-least-once replay: batch 2 re-delivers every batch-1 event
    (within the watermark horizon) plus two new ones. The deduped
    output must contain each event_id exactly once — the in-flight
    version of the reference's ON CONFLICT sink."""
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()

    b1 = [(1, _ts(0, 10), 7), (2, _ts(0, 20), 7), (3, _ts(0, 30), 8)]
    b2 = b1 + [(4, _ts(0, 40), 8), (5, _ts(0, 50), 9)]

    def run(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))
        q = (
            dedup_within_watermark(
                spark.readStream.schema(SCHEMA).parquet(f"{src}/*")
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("b1", b1)
    run("b2", b2)

    got = sorted(
        (r["event_id"], r["ts"], r["user_id"])
        for r in spark.read.parquet(str(out)).collect()
    )
    assert got == sorted(set(b1) | set(b2))


def test_stream_dedup_replay_is_noop(spark, tmp_path):
    """A pure replay (no new data) emits nothing."""
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    rows = [(1, _ts(1, 0), 1), (1, _ts(1, 0), 1), (2, _ts(1, 5), 1)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))

    def run():
        q = (
            dedup_within_watermark(
                spark.readStream.schema(SCHEMA).parquet(f"{src}/*")
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    n1 = spark.read.parquet(str(out)).count()
    run()  # no new files → no new output
    n2 = spark.read.parquet(str(out)).count()
    assert n1 == 2 and n2 == 2  # intra-batch dup of event 1 also collapsed


def test_stream_dedup_drops_late_replays_as_late_data(spark, tmp_path):
    """A replay carrying its ORIGINAL event time behind the watermark is
    dropped by the watermark itself (late data) — it does NOT re-emit
    even though the dedup state was evicted. Re-emission is only
    possible for a re-delivery stamped with a fresh in-window event
    time. This pins the semantics so a future change can't silently
    alter the contract."""
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()

    def run(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))
        q = (
            dedup_within_watermark(
                spark.readStream.schema(SCHEMA).parquet(f"{src}/*"),
                watermark="10 minutes",
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: e1@00:00 plus e2@01:00 advances the watermark to 00:50,
    # evicting e1's dedup state
    run("b1", [(1, _ts(0, 0), 7), (2, _ts(1, 0), 7)])
    # batch 2: a late replay of e1 — behind the watermark, dropped
    run("b2", [(1, _ts(0, 0), 7)])

    ids = sorted(r["event_id"] for r in spark.read.parquet(str(out)).collect())
    assert ids == [1, 2]


def test_interval_join_stream_equals_batch(spark, sf_dir, tmp_path):
    """The click→purchase interval join is ONE transformation: the
    availableNow stream-stream result over the events files equals the
    batch result of the same expression (§2.7 unbounded-table parity)."""
    events_dir = tmp_path / "ev"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "p0.parquet")

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    stream = open_events_stream(spark, str(events_dir))
    q = (
        stream_click_attribution(*split(stream), watermark="25 hours")
        .writeStream.format("memory")
        .queryName("cp_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        map(tuple, spark.sql("SELECT click_id, purchase_id FROM cp_pairs").collect())
    )
    want = sorted(
        map(
            tuple,
            click_purchase_pairs(*split(table(spark, sf_dir, "events")))
            .select("click_id", "purchase_id")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_interval_join_batch_oracle(spark, sf_dir, ddb):
    """Batch form of the pair join vs a DuckDB range-join oracle."""
    ev = table(spark, sf_dir, "events")
    got = sorted(
        map(
            tuple,
            click_purchase_pairs(
                ev.filter(F.col("event_type") == "click"),
                ev.filter(F.col("event_type") == "purchase"),
            )
            .select("user_id", "click_id", "purchase_id")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            ddb.execute(
                """
                SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
                FROM events c JOIN events p
                  ON c.user_id = p.user_id
                 AND c.event_type = 'click' AND p.event_type = 'purchase'
                 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
                """
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0
