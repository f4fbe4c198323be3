"""Hypothesis property tests (SURVEY.md §5.2.4): contracts that must
hold for arbitrary inputs, not just fixtures."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.operators.cleaning import epoch_to_ts
from rustcheatersdatapipeline_spark.operators.dedup import keyed_dedup
from rustcheatersdatapipeline_spark.warehouse.writers import (
    insert_if_absent,
    upsert_latest_wins,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=1, max_size=30
)


@given(data=rows)
@_settings
def test_keyed_dedup_layout_invariant(spark, data):
    """Survivor choice must not depend on partitioning (D1 contract)."""
    df = spark.createDataFrame(data, "k int, v int")
    a = sorted(map(tuple, keyed_dedup(df, ["k"]).collect()))
    b = sorted(map(tuple, keyed_dedup(df.repartition(5), ["k"]).collect()))
    c = sorted(map(tuple, keyed_dedup(df.coalesce(1), ["k"]).collect()))
    assert a == b == c
    assert len(a) == len({k for k, _ in data})


@pytest.mark.slow
@given(data=rows, incoming=rows)
@_settings
def test_upsert_idempotent_and_complete(spark, data, incoming):
    """D12: applying the same incoming twice == applying once; every
    incoming key ends up with an incoming value."""
    t = spark.createDataFrame(data, "k int, v int").dropDuplicates(["k"])
    inc = keyed_dedup(spark.createDataFrame(incoming, "k int, v int"), ["k"])
    once = upsert_latest_wins(t, inc, ["k"])
    twice = upsert_latest_wins(once, inc, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    got = dict(map(tuple, once.collect()))
    want_inc = dict(map(tuple, inc.collect()))
    for k, v in want_inc.items():
        assert got[k] == v


@pytest.mark.slow
@given(data=rows, incoming=rows)
@_settings
def test_insert_if_absent_never_overwrites(spark, data, incoming):
    """D11: existing keys keep their values; new keys appear exactly once."""
    t = spark.createDataFrame(data, "k int, v int").dropDuplicates(["k"])
    inc = spark.createDataFrame(incoming, "k int, v int").dropDuplicates(["k"])
    out = insert_if_absent(t, inc, ["k"])
    before = dict(map(tuple, t.collect()))
    after = dict(map(tuple, out.collect()))
    for k, v in before.items():
        assert after[k] == v
    assert set(after) == set(before) | {k for k, _ in inc.collect()}
    assert out.count() == len(after)  # no key duplicated


@given(epochs=st.lists(st.integers(1, 2**31 - 1), min_size=1, max_size=20))
@_settings
def test_epoch_round_trip(spark, epochs):
    """P13: epoch→timestamp→epoch is exact for any 32-bit second count."""
    df = spark.createDataFrame([(e,) for e in epochs], "e long")
    out = df.select("e", F.unix_timestamp(epoch_to_ts("e")).alias("back")).collect()
    assert all(r["e"] == r["back"] for r in out)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=1, max_size=40
    )
)
@_settings
def test_connected_components_equals_union_find(spark, edges):
    """CC contract on arbitrary graphs: every edge-touched node gets the
    minimum id reachable from it (checked against a sequential
    union-find)."""
    from rustcheatersdatapipeline_spark.operators.graph import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == want
