"""Silver IO fidelity (SURVEY.md §2.1 S4/S12/S13): CSV round-trips must
not corrupt int64 steam ids (the reference's staged-CSV contract), and
date-partitioned bronze layouts must partition-prune."""

import datetime

from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.schemas import BRONZE_SCHEMAS
from rustcheatersdatapipeline_spark.transforms.builders import bans_fact

from .fixtures import write_fixtures

INTERVAL_END = datetime.datetime(2022, 1, 15, 12, 0, 0)


def test_csv_round_trip_preserves_int64(spark, tmp_path):
    """S12/S13: write silver as header CSV, read back with the pinned
    schema — steam ids (> 2^53) survive exactly (the reference's pandas
    CSV path risks stringify/float corruption; SURVEY.md §1.3)."""
    write_fixtures(tmp_path)
    bronze = spark.read.schema(BRONZE_SCHEMAS["player_bans"]).json(
        str(tmp_path / "player_bans.json")
    )
    silver = bans_fact(bronze, INTERVAL_END)
    out = tmp_path / "bans_csv"
    silver.write.csv(str(out), header=True, timestampFormat="yyyy-MM-dd HH:mm:ss")
    back = spark.read.csv(
        str(out), header=True, schema=silver.schema, timestampFormat="yyyy-MM-dd HH:mm:ss"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, silver.collect()))
    assert back.schema == silver.schema


def test_partitioned_bronze_prunes(spark, tmp_path):
    """S4: the reference's YYYY/MM/DD S3 layout becomes
    partitionBy(year, month, day) → Catalyst partition pruning."""
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3 + 2020).cast("int").alias("year"),
        F.lit(1).alias("month"),
        (F.col("id") % 5 + 1).cast("int").alias("day"),
    )
    path = str(tmp_path / "bronze_part")
    df.write.partitionBy("year", "month", "day").parquet(path)
    scan = spark.read.parquet(path).filter("year = 2021 AND day = 3")
    assert scan.count() == df.filter("id % 3 = 1 AND id % 5 = 2").count()
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # pruned scan reads only matching partition dirs
    assert "PartitionFilters" in plan or scan.rdd.getNumPartitions() <= 4
