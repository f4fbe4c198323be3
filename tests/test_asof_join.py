"""General as-of join (operators/joins.py) — differential vs pandas
merge_asof on seeded random inputs across directions, tolerance and
group keys, plus hand-built edge cases."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.operators.joins import asof_join


def _random_case(seed: int, n_left=60, n_right=40, n_groups=4):
    import random

    rng = random.Random(seed)
    left = [
        (rng.randrange(n_groups), float(rng.randrange(0, 1000)), i)
        for i in range(n_left)
    ]
    right_ts = set()
    right = []
    for j in range(n_right):
        g, t = rng.randrange(n_groups), float(rng.randrange(0, 1000))
        if (g, t) in right_ts:  # merge_asof needs unique (by, ts) too
            continue
        right_ts.add((g, t))
        right.append((g, t, f"p{j}"))
    return left, right


def _expected(left, right, direction, tolerance=None):
    lp = pd.DataFrame(left, columns=["g", "t", "lid"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(right, columns=["g", "t", "payload"]).sort_values(
        "t", kind="stable"
    )
    m = pd.merge_asof(
        lp, rp, on="t", by="g", direction=direction, tolerance=tolerance
    )
    return {
        (int(r.g), float(r.t), int(r.lid)): (None if pd.isna(r.payload) else r.payload)
        for r in m.itertuples()
    }


@pytest.mark.slow
@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("seed", [3, 17])
def test_matches_pandas_merge_asof(spark, direction, seed):
    left, right = _random_case(seed)
    ldf = spark.createDataFrame(left, "g int, t double, lid int")
    rdf = spark.createDataFrame(right, "g int, t double, payload string")
    got = {
        (r["g"], r["t"], r["lid"]): r["payload_r"]
        for r in asof_join(ldf, rdf, "t", ["g"], direction=direction).collect()
    }
    assert got == _expected(left, right, direction)


def test_tolerance_bounds_the_match(spark):
    left = [(0, 100.0, 1), (0, 500.0, 2)]
    right = [(0, 95.0, "near"), (0, 100.5, "future")]
    ldf = spark.createDataFrame(left, "g int, t double, lid int")
    rdf = spark.createDataFrame(right, "g int, t double, payload string")
    got = {
        r["lid"]: r["payload_r"]
        for r in asof_join(ldf, rdf, "t", ["g"], tolerance=F.lit(10.0)).collect()
    }
    # lid 1 matches the 5-away observation; lid 2's nearest is 399.5
    # behind — beyond tolerance, NULL
    assert got == {1: "near", 2: None}
    exp = _expected(left, right, "backward", tolerance=10.0)
    assert {k[2]: v for k, v in exp.items()} == got


def test_equal_timestamp_is_inclusive_both_directions(spark):
    left = [(0, 100.0, 1)]
    right = [(0, 100.0, "same")]
    ldf = spark.createDataFrame(left, "g int, t double, lid int")
    rdf = spark.createDataFrame(right, "g int, t double, payload string")
    for d in ("backward", "forward"):
        got = asof_join(ldf, rdf, "t", ["g"], direction=d).collect()
        assert got[0]["payload_r"] == "same", d


def test_groups_do_not_leak(spark):
    ldf = spark.createDataFrame([(0, 100.0, 1), (1, 100.0, 2)], "g int, t double, lid int")
    rdf = spark.createDataFrame([(0, 50.0, "g0 only")], "g int, t double, payload string")
    got = {r["lid"]: r["payload_r"] for r in asof_join(ldf, rdf, "t", ["g"]).collect()}
    assert got == {1: "g0 only", 2: None}


def test_matches_declared_query_semantics(spark, sf_dir):
    """The generic operator reproduces the declared events_asof_join on
    the real corpus (same dedup discipline on the right side)."""
    from rustcheatersdatapipeline_spark.catalog import table
    from rustcheatersdatapipeline_spark.plans.analytics import events_asof_join

    ev = table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("l_id")
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("r_id"))
    )
    got = {
        r["l_id"]: r["r_id_r"]
        for r in asof_join(left, right, "ts", ["user_id"]).collect()
    }
    want = {r["l_id"]: r["r_id"] for r in events_asof_join(spark, sf_dir).collect()}
    assert got == want


def test_interval_join_matches_naive(spark):
    """Differential vs the naive python double loop on seeded random
    intervals, all four endpoint modes."""
    import random

    from rustcheatersdatapipeline_spark.operators.joins import interval_join

    rng = random.Random(5)
    left = [(rng.randrange(3), float(rng.randrange(100)), i) for i in range(50)]
    right = []
    for j in range(25):
        g, s = rng.randrange(3), float(rng.randrange(100))
        right.append((g, s, s + rng.randrange(1, 15), f"iv{j}"))
    ldf = spark.createDataFrame(left, "g int, t double, lid int")
    rdf = spark.createDataFrame(right, "g int, s double, e double, tag string")

    checks = {
        "both": lambda t, s, e: s <= t <= e,
        "left": lambda t, s, e: s <= t < e,
        "right": lambda t, s, e: s < t <= e,
        "neither": lambda t, s, e: s < t < e,
    }
    for mode, ok in checks.items():
        want = set()
        for g, t, lid in left:
            matched = [tag for (rg, s, e, tag) in right if rg == g and ok(t, s, e)]
            for tag in matched or [None]:
                want.add((lid, tag))
        got = {
            (r["lid"], r["tag_r"])
            for r in interval_join(
                ldf, rdf, ["g"], "t", "s", "e", inclusive=mode
            ).collect()
        }
        assert got == want, mode


def test_interval_join_reproduces_session_attribution_shape(spark, sf_dir):
    """Attributing events to their sessions through the generic
    operator recounts exactly the sessionizer's n_events."""
    from pyspark.sql.window import Window

    from rustcheatersdatapipeline_spark.catalog import table
    from rustcheatersdatapipeline_spark.operators.joins import interval_join
    from rustcheatersdatapipeline_spark.plans.analytics import SESSION_GAP_MIN

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTE")),
            1,
        ).otherwise(0).alias("new_s"),
    )
    sess_rows = flagged.select(
        "user_id", "ts", "event_id", F.sum("new_s").over(w).alias("session_id")
    )
    sessions = sess_rows.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e"),
        F.count(F.lit(1)).alias("n_events"),
    )
    attributed = interval_join(
        ev.select("user_id", "ts", "event_id"), sessions, ["user_id"], "ts", "s", "e"
    )
    recount = attributed.groupBy("user_id", "session_id_r").agg(
        F.count(F.lit(1)).alias("n")
    )
    joined = recount.join(
        sessions,
        (recount["user_id"] == sessions["user_id"])
        & (recount["session_id_r"] == sessions["session_id"]),
    ).select("n", "n_events").collect()
    assert joined and all(r["n"] == r["n_events"] for r in joined)
