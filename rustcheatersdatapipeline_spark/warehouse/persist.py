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
    "bans_fact",
    "friends_fact",
    "game_playing_banned_fact",
    "game_playtime_fact",
    "groups_fact",
    "stats_fact",
}

#: Bucketing key for the table-catalog layout: every fact joins
#: player_dim on player_sk, and cross-fact correlation queries join
#: fact-to-fact on it — the one key whose co-location removes a shuffle
#: from every repeated big-big join. (date_sk handles pruning via
#: partitioning; the bounded dims broadcast, needing neither.)
GOLD_BUCKET_KEY = "player_sk"
GOLD_BUCKETS = 8


def write_gold(gold: dict[str, DataFrame], path: str) -> None:
    for name, df in gold.items():
        w = df.write.mode("overwrite")
        if name in PARTITIONED_FACTS and "date_sk" in df.columns:
            w = w.partitionBy("date_sk")
        w.parquet(os.path.join(path, name))


def write_gold_tables(
    spark: SparkSession,
    gold: dict[str, DataFrame],
    database: str,
    path: str,
    buckets: int = GOLD_BUCKETS,
) -> None:
    """Catalog-table variant of ``write_gold``: same date_sk partition
    layout, plus facts bucketed (and sort-ordered) on ``player_sk`` so
    repeated fact⋈fact / fact⋈player joins scan co-located buckets with
    NO exchange on either side (pinned by
    tests/test_skew_and_bucketing.py). Bucketing requires the table
    catalog — plain ``.parquet(path)`` writes cannot record bucket
    metadata.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{path}'")
    for name, df in gold.items():
        w = df.write.mode("overwrite").format("parquet")
        if name in PARTITIONED_FACTS and "date_sk" in df.columns:
            w = w.partitionBy("date_sk")
        if name.endswith("_fact") and GOLD_BUCKET_KEY in df.columns:
            w = w.bucketBy(buckets, GOLD_BUCKET_KEY).sortBy(GOLD_BUCKET_KEY)
        w.saveAsTable(f"{database}.{name}")


def read_gold(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in os.listdir(path):
        out[name] = spark.read.parquet(os.path.join(path, name))
    return out
