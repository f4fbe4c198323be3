"""Python DataSource V2 for the timeline source (SURVEY.md §2.1 S1).

Spark 4's ``pyspark.sql.datasource`` API lets the engine expose the
paginated timeline pull as a first-class ``spark.read.format(...)``
source instead of a driver loop + createDataFrame. The source reads a
RECORDED timeline document (the bronze capture a fetcher produced) —
live HTTP stays out of executors by design: the global API rate limit
makes fan-out wrong (SURVEY.md §4.3.1), so ingestion happens once,
driver-side, and this source replays the capture with a single input
partition (parallelism begins downstream, after Catalyst).

Usage::

    spark.dataSource.register(TwitterTimelineDataSource)
    df = (spark.read.format("twitter_timeline")
          .option("path", "/bronze/twitter/2022/01/15/run.json").load())
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

#: output schema: the reference's extracted profile-URL rows
#: (helpers.py:40-48 → FIXTURES.md §A1)
SCHEMA_DDL = (
    "profile_name_at_ban string, profile_url string, tweet_created_time string"
)


class TwitterTimelineReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("twitter_timeline source requires option 'path'")

    def read(self, partition):
        with open(self.path) as fh:
            doc = json.load(fh)
        for row in doc.get("steam_profile_urls", []):
            yield (
                row.get("profile_name_at_ban"),
                row.get("profile_url"),
                row.get("tweet_created_time"),
            )


def _rows_from_capture(path: str):
    with open(path) as fh:
        doc = json.load(fh)
    for row in doc.get("steam_profile_urls", []):
        yield (
            row.get("profile_name_at_ban"),
            row.get("profile_url"),
            row.get("tweet_created_time"),
        )


class TwitterTimelineStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the hourly pull (SURVEY.md §2.7): each capture
    file the driver-side fetcher drops into ``dir`` is one
    micro-batch's worth of rows. The offset is the count of consumed
    files in lexicographic order (capture names embed the interval
    timestamp, so arrival order == name order); ``readBetweenOffsets``
    replays any committed range exactly, giving end-to-end exactly-once
    with the checkpointed query + idempotent warehouse sink.
    """

    def __init__(self, options):
        self.dir = options.get("dir")
        if not self.dir:
            raise ValueError("twitter_timeline stream requires option 'dir'")

    def _files(self):
        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(".json")
        )

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        files = self._files()
        i = start["index"]
        rows = []
        for f in files[i:]:
            rows.extend(_rows_from_capture(os.path.join(self.dir, f)))
        return iter(rows), {"index": len(files)}

    def readBetweenOffsets(self, start, end):
        files = self._files()
        rows = []
        for f in files[start["index"] : end["index"]]:
            rows.extend(_rows_from_capture(os.path.join(self.dir, f)))
        return iter(rows)


class TwitterTimelineDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "twitter_timeline"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return TwitterTimelineReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return TwitterTimelineStreamReader(self.options)
