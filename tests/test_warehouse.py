"""Gold warehouse tests: fact-load joins, surrogate keys, upsert
semantics, idempotency (SURVEY.md §5.2.4 property tests)."""

import datetime

import pytest
from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.schemas import BRONZE_SCHEMAS
from rustcheatersdatapipeline_spark.transforms.builders import (
    DIM_TRANSFORMS,
    FACT_TRANSFORMS,
)
from rustcheatersdatapipeline_spark.warehouse import (
    build_warehouse,
    date_dim,
    insert_if_absent,
    upsert_latest_wins,
    with_surrogate_key,
)

from .fixtures import write_fixtures

INTERVAL_END = datetime.datetime(2022, 1, 15, 12, 0, 0)
D0 = datetime.date(2017, 1, 1)
D1 = datetime.date(2022, 12, 31)


@pytest.fixture(scope="module")
def silver(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bronze_wh")
    paths = write_fixtures(d)
    bronze = {
        name: spark.read.schema(BRONZE_SCHEMAS[name]).json(path)
        for name, path in paths.items()
    }
    out = {}
    for name, (fn, src) in {**DIM_TRANSFORMS, **FACT_TRANSFORMS}.items():
        out[name] = fn(bronze[src], INTERVAL_END).cache()
    return out


@pytest.fixture(scope="module")
def gold(spark, silver):
    g = build_warehouse(spark, silver, D0, D1)
    return {k: v.cache() for k, v in g.items()}


def test_date_dim_shape(spark):
    dd = date_dim(spark, datetime.date(2022, 1, 1), datetime.date(2022, 1, 31))
    rows = dd.collect()
    assert len(rows) == 31
    assert rows[0]["date_sk"] == 1 and rows[0]["week_day"] == "Saturday"
    assert rows[30]["full_date"] == datetime.date(2022, 1, 31)


def test_surrogate_keys_deterministic(spark, silver):
    a = with_surrogate_key(silver["game_dim"], ["game_id", "name"], "game_sk")
    b = with_surrogate_key(silver["game_dim"].repartition(7), ["game_id", "name"], "game_sk")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fact_loads_produce_valid_fks(gold):
    """Every fact SK must resolve in its dim (referential consistency —
    the engine's key contract, SURVEY.md §7.3.1)."""
    checks = {
        "achievement_fact": [("achievement_sk", "achievement_dim"), ("player_sk", "player_dim"), ("game_sk", "game_dim"), ("date_sk", "date_dim")],
        "badges_fact": [("badge_sk", "badges_dim"), ("player_sk", "player_dim")],
        "bans_fact": [("player_sk", "player_dim"), ("date_sk", "date_dim")],
        "friends_fact": [("player_friend_sk", "friend_dim"), ("relationship_sk", "relationship_dim")],
        "game_playtime_fact": [("game_sk", "game_dim")],
        "groups_fact": [("group_sk", "group_dim")],
        "stats_fact": [("stats_sk", "stats_dim")],
    }
    for fact, pairs in checks.items():
        fdf = gold[fact]
        assert fdf.count() > 0, f"{fact} is empty"
        for sk, dim in pairs:
            orphans = fdf.join(gold[dim], sk, "left_anti").count()
            assert orphans == 0, f"{fact}.{sk} has {orphans} orphans"


def test_achievement_fact_join_and_time(gold):
    rows = gold["achievement_fact"].collect()
    assert len(rows) == 2  # two achieved rows from fixtures
    assert all(r["time"] is not None and len(r["time"]) == 8 for r in rows)  # J10


def test_bans_upsert_latest_wins(spark, gold, silver):
    """D12: re-loading bans with new values overwrites by player_sk."""
    bans2 = silver["bans_fact"].withColumn("num_game_bans", F.lit(99).cast("long"))
    g2 = build_warehouse(
        spark,
        {**silver, "bans_fact": bans2},
        D0,
        D1,
        existing=gold,
    )
    vals = {r["player_sk"]: r["num_game_bans"] for r in g2["bans_fact"].collect()}
    assert set(vals.values()) == {99}
    assert g2["bans_fact"].count() == gold["bans_fact"].count()


def test_idempotent_rerun(spark, silver, gold):
    """Re-applying the same batch leaves every gold table unchanged
    (D11/D12 contract — SURVEY.md §5.2.4)."""
    g2 = build_warehouse(spark, silver, D0, D1, existing=gold)
    for name in gold:
        before = sorted(map(tuple, gold[name].collect()))
        after = sorted(map(tuple, g2[name].collect()))
        assert before == after, f"{name} changed on idempotent rerun"


def test_insert_if_absent_primitive(spark):
    t = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    n = spark.createDataFrame([(2, "X"), (3, "c")], "k int, v string")
    out = sorted(map(tuple, insert_if_absent(t, n, ["k"]).collect()))
    assert out == [(1, "a"), (2, "b"), (3, "c")]


def test_upsert_latest_wins_primitive(spark):
    t = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    n = spark.createDataFrame([(2, "X"), (3, "c")], "k int, v string")
    out = sorted(map(tuple, upsert_latest_wins(t, n, ["k"]).collect()))
    assert out == [(1, "a"), (2, "X"), (3, "c")]


def _rows(df):
    return sorted(map(tuple, df.collect()))




def test_scd2_build_and_incremental_apply(spark):
    from rustcheatersdatapipeline_spark.warehouse.writers import scd2_apply, scd2_build

    rows = [
        ("u1", 10.0, "2024-01-01 00:00:00"),
        ("u1", 10.0, "2024-01-02 00:00:00"),  # no change -> collapsed
        ("u1", 20.0, "2024-01-03 00:00:00"),
        ("u2", 5.0, "2024-01-01 12:00:00"),
    ]
    df = spark.createDataFrame(rows, "k string, value double, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    hist = scd2_build(df, ["k"], "value", "ts")
    got = {
        (r["k"], r["value"]): (str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
        for r in hist.collect()
    }
    assert got[("u1", 10.0)] == ("2024-01-01 00:00:00", "2024-01-03 00:00:00", 0)
    assert got[("u1", 20.0)][2] == 1 and got[("u1", 20.0)][1] == "None"
    assert got[("u2", 5.0)][2] == 1

    # incremental apply == build over the concatenated stream, and
    # re-applying the same batch is a no-op (at-least-once contract)
    b1 = df.filter(F.col("ts") < F.lit("2024-01-02 12:00:00").cast("timestamp"))
    b2 = df.filter(F.col("ts") >= F.lit("2024-01-02 12:00:00").cast("timestamp"))
    h1 = scd2_build(b1, ["k"], "value", "ts")
    h12 = scd2_apply(h1, b2, ["k"], "value", "ts")
    assert _rows(h12) == _rows(hist)
    assert _rows(scd2_apply(h12, b2, ["k"], "value", "ts")) == _rows(hist)
