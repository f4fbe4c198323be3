"""Scale-path utilities: salted agg/join equivalence, bucketed
co-located joins (no exchange on the join key)."""

from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.operators.skew import salted_aggregate, salted_join


def test_salted_aggregate_equals_plain(spark):
    # heavy-hitter key 0: 10k rows; others tiny
    df = spark.range(11000).select(
        F.when(F.col("id") < 10000, 0).otherwise(F.col("id") % 7 + 1).alias("k"),
        (F.col("id") % 100).alias("v"),
    )
    got = sorted(
        map(
            tuple,
            salted_aggregate(
                df, ["k"], {"s": ("sum", "v"), "c": ("count", "v"), "mx": ("max", "v")}
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            df.groupBy("k")
            .agg(F.sum("v").alias("s"), F.count("v").alias("c"), F.max("v").alias("mx"))
            .collect(),
        )
    )
    assert got == want


def test_salted_join_equals_plain(spark):
    big = spark.range(5000).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, name string")
    got = sorted(map(tuple, salted_join(big, small, "k").select("k", "v", "name").collect()))
    want = sorted(map(tuple, big.join(small, "k").select("k", "v", "name").collect()))
    assert got == want


def test_gold_tables_prune_and_bucket(spark, tmp_path):
    """The persisted gold layout must deliver both 100 TB read paths:
    (1) a date-ranged insight prunes to the touched date_sk partitions;
    (2) fact⋈fact on player_sk runs bucket-co-located, no Exchange."""
    import datetime

    from rustcheatersdatapipeline_spark.pipeline import run_batch
    from rustcheatersdatapipeline_spark.plans.insights import bans_per_country_in_range
    from rustcheatersdatapipeline_spark.warehouse.persist import write_gold_tables

    from .fixtures import write_fixtures

    bronze = tmp_path / "bronze"
    bronze.mkdir()
    write_fixtures(bronze)
    res = run_batch(spark, str(bronze), datetime.datetime(2022, 1, 15, 12, 0, 0))
    assert res.succeeded
    write_gold_tables(spark, res.gold, "goldtest", f"{tmp_path}/gold")
    back = {
        name: spark.table(f"goldtest.{name}") for name in res.gold
    }

    # (1) partition pruning on the date-ranged insight
    sks = sorted(r["date_sk"] for r in back["bans_fact"].select("date_sk").distinct().collect())
    insight = bans_per_country_in_range(back, sks[0], sks[0])
    plan = insight._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "date_sk" in pf, plan

    # (2) player_sk fact-fact join: bucketed scans, no Exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            back["bans_fact"].select("player_sk", "num_vac_bans")
            .join(back["game_playtime_fact"].select("player_sk", "game_sk"), "player_sk")
        )
        jplan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in jplan, jplan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-located bucketed tables join without an Exchange on either side
    — the pre-partitioning strategy for repeated big-big joins at scale."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/bkt'")
    spark.range(10000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")).write.bucketBy(
        8, "k"
    ).sortBy("k").mode("overwrite").saveAsTable("bkt.t1")
    spark.range(10000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w")).write.bucketBy(
        8, "k"
    ).sortBy("k").mode("overwrite").saveAsTable("bkt.t2")
    # force the big-big path: with broadcast available the planner skips
    # bucketed scans entirely (it broadcasts the small table instead)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt.t1").join(spark.table("bkt.t2"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert j.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
