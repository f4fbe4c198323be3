"""Twitter timeline source (SURVEY.md §2.1 S1-S4).

The reference pulls one user's tweets for the hourly interval via tweepy
pagination (reference dags/scripts/helpers.py:21-31), filters to
interval + author (helpers.py:35-39), and extracts
``{name_at_ban, profile_url, tweet_created_time}`` per tweet
(helpers.py:40-48). Here the paginated pull is a driver-side callable
(injectable, like the Steam transport); the filter + extraction are
DataFrame operators so they run distributed once tweets land in bronze.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: bronze schema for one tweet (fields the reference touches)
TWEET_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("author_id", StringType()),
        StructField("created_at", TimestampType()),
        StructField("text", StringType()),
        StructField(
            "entities",
            StructType(
                [
                    StructField(
                        "urls",
                        ArrayType(
                            StructType([StructField("expanded_url", StringType())])
                        ),
                    )
                ]
            ),
        ),
    ]
)


def timeline_to_df(
    spark: SparkSession, pages: Iterable[list[dict]] | Callable[[], Iterable[list[dict]]]
) -> DataFrame:
    """S1: materialize a paginated timeline pull into a bronze DataFrame.

    ``pages`` yields lists of tweet dicts (one list per page) — the shape
    tweepy pagination produces. The driver loop is intentional: the pull
    is a single-account API read (not scalable work); everything after
    is distributed.
    """
    if callable(pages):
        pages = pages()
    rows = [t for page in pages for t in page]
    return spark.createDataFrame(rows, TWEET_SCHEMA)


def interval_filter(
    tweets: DataFrame, author_id: str, start: _dt.datetime, end: _dt.datetime
) -> DataFrame:
    """S2 (reference helpers.py:35-39): tweets strictly inside
    [start, end] from the target account only."""
    return tweets.filter(
        (F.col("created_at") >= F.lit(start))
        & (F.col("created_at") <= F.lit(end))
        & (F.col("author_id") == author_id)
    )


def extract_profile_urls(tweets: DataFrame) -> DataFrame:
    """S3 (reference helpers.py:40-48): project
    {profile_name_at_ban, profile_url, tweet_created_time}.

    - name at ban: ``text.split(" was banned ")[0]`` (helpers.py:42-43)
    - profile url: first expanded URL in entities (helpers.py:44)
    - created time: ISO-8601 Z format (helpers.py:44-46)
    """
    return tweets.select(
        F.split(F.col("text"), " was banned ").getItem(0).alias("profile_name_at_ban"),
        # get() tolerates empty url arrays (ANSI mode) → null → filtered
        F.get(F.col("entities.urls"), 0).getField("expanded_url").alias("profile_url"),
        F.date_format(F.col("created_at"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "tweet_created_time"
        ),
    ).filter(F.col("profile_url").isNotNull())
