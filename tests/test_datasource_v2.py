"""Python DataSource V2 registration + read (S1 as spark.read.format)."""

import json


def test_twitter_timeline_datasource(spark, tmp_path):
    from rustcheatersdatapipeline_spark.sources.datasource import (
        TwitterTimelineDataSource,
    )

    doc = {
        "steam_profile_urls": [
            {
                "profile_name_at_ban": "cheater_one",
                "profile_url": "http://steamcommunity.com/profiles/76561198000000001/",
                "tweet_created_time": "2022-01-15T11:30:00Z",
            },
            {
                "profile_name_at_ban": "vanity_user",
                "profile_url": "https://steamcommunity.com/id/somevanity/",
                "tweet_created_time": "2022-01-15T11:59:00Z",
            },
        ],
        "debug": {"extract_start_datetime": "2022-01-15T11:00:00Z"},
    }
    p = tmp_path / "run.json"
    p.write_text(json.dumps(doc))

    spark.dataSource.register(TwitterTimelineDataSource)
    df = spark.read.format("twitter_timeline").option("path", str(p)).load()
    rows = df.orderBy("tweet_created_time").collect()
    assert [r["profile_name_at_ban"] for r in rows] == ["cheater_one", "vanity_user"]
    assert df.columns == ["profile_name_at_ban", "profile_url", "tweet_created_time"]


def _capture(n, name):
    return {
        "steam_profile_urls": [
            {
                "profile_name_at_ban": name,
                "profile_url": f"http://steamcommunity.com/profiles/7656119800000000{n}/",
                "tweet_created_time": f"2022-01-15T1{n}:30:00Z",
            }
        ]
    }


def test_twitter_timeline_stream_source(spark, tmp_path):
    """Streaming DataSource V2: each hourly capture file is consumed
    exactly once across checkpointed availableNow restarts (the
    reference's hourly-pull cadence as a real readStream)."""
    import json as _json

    from rustcheatersdatapipeline_spark.sources.datasource import (
        TwitterTimelineDataSource,
    )

    cap, out, ckpt = tmp_path / "cap", tmp_path / "out", tmp_path / "ckpt"
    cap.mkdir()
    spark.dataSource.register(TwitterTimelineDataSource)

    def run_once():
        q = (
            spark.readStream.format("twitter_timeline")
            .option("dir", str(cap))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (cap / "2022011511.json").write_text(_json.dumps(_capture(1, "first_user")))
    run_once()
    (cap / "2022011512.json").write_text(_json.dumps(_capture(2, "second_user")))
    run_once()

    names = sorted(
        r["profile_name_at_ban"] for r in spark.read.parquet(str(out)).collect()
    )
    assert names == ["first_user", "second_user"]  # each file exactly once
