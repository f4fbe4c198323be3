"""Twitter source tests (S1-S3) on recorded-page fixtures."""

import datetime

from rustcheatersdatapipeline_spark.sources.twitter import (
    extract_profile_urls,
    interval_filter,
    timeline_to_df,
)

START = datetime.datetime(2022, 1, 15, 11, 0, 0)
END = datetime.datetime(2022, 1, 15, 12, 0, 0)

PAGES = [
    [
        {
            "id": "1",
            "author_id": "rusthackreport",
            "created_at": datetime.datetime(2022, 1, 15, 11, 30, 0),
            "text": "cheater_one was banned by anti-cheat",
            "entities": {
                "urls": [
                    {"expanded_url": "http://steamcommunity.com/profiles/76561198000000001/"}
                ]
            },
        },
        {
            # outside interval
            "id": "2",
            "author_id": "rusthackreport",
            "created_at": datetime.datetime(2022, 1, 15, 10, 0, 0),
            "text": "old_cheater was banned ...",
            "entities": {"urls": [{"expanded_url": "http://x/p/1"}]},
        },
    ],
    [
        {
            # wrong author
            "id": "3",
            "author_id": "someone_else",
            "created_at": datetime.datetime(2022, 1, 15, 11, 45, 0),
            "text": "spam",
            "entities": {"urls": []},
        },
        {
            # in interval, no url entity → dropped at extraction
            "id": "4",
            "author_id": "rusthackreport",
            "created_at": datetime.datetime(2022, 1, 15, 11, 50, 0),
            "text": "announcement without link was banned x",
            "entities": {"urls": []},
        },
        {
            "id": "5",
            "author_id": "rusthackreport",
            "created_at": datetime.datetime(2022, 1, 15, 11, 59, 0),
            "text": "vanity_user was banned today",
            "entities": {
                "urls": [{"expanded_url": "https://steamcommunity.com/id/somevanity/"}]
            },
        },
    ],
]


def test_timeline_interval_and_extraction(spark):
    df = timeline_to_df(spark, PAGES)
    assert df.count() == 5
    scoped = interval_filter(df, "rusthackreport", START, END)
    assert sorted(r["id"] for r in scoped.collect()) == ["1", "4", "5"]
    out = extract_profile_urls(scoped).orderBy("tweet_created_time").collect()
    assert [(r["profile_name_at_ban"], r["profile_url"]) for r in out] == [
        ("cheater_one", "http://steamcommunity.com/profiles/76561198000000001/"),
        ("vanity_user", "https://steamcommunity.com/id/somevanity/"),
    ]
    assert out[0]["tweet_created_time"] == "2022-01-15T11:30:00Z"
