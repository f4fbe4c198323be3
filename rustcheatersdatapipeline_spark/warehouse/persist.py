"""Gold warehouse persistence (SURVEY.md §1.1 gold zone).

Storage layout designed for the 100 TB read patterns:

- facts carrying ``date_sk`` are partitioned by it — every insight query
  and incremental load prunes to the dates it touches (the Spark
  equivalent of the reference's YYYY/MM/DD S3 layout, §4.1);
- dims are small, written unpartitioned (they broadcast anyway);
- everything is Parquet: columnar pruning + predicate pushdown, unlike
  the reference's CSV text round-trips (§4.4).

``overwrite`` mode keeps batch writes idempotent at the file level: a
re-run of the same batch rewrites the same content (the upsert writers
already guarantee value-level idempotency).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

PARTITIONED_FACTS = {
    "achievement_fact",
    "badges_fact",
    "friends_fact",
    "game_playing_banned_fact",
    "game_playtime_fact",
    "groups_fact",
    "stats_fact",
}


def write_gold(gold: dict[str, DataFrame], path: str) -> None:
    for name, df in gold.items():
        w = df.write.mode("overwrite")
        if name in PARTITIONED_FACTS and "date_sk" in df.columns:
            w = w.partitionBy("date_sk")
        w.parquet(os.path.join(path, name))


def read_gold(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in os.listdir(path):
        out[name] = spark.read.parquet(os.path.join(path, name))
    return out
