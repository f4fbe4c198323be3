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
