"""Unit tests for the §2.2/§2.3 operator library."""

import pytest
from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.operators import (
    ValidationError,
    assert_no_duplicates,
    assert_no_nulls,
    conditional_overwrite,
    ensure_columns,
    epoch_to_ts,
    keyed_dedup,
    time_of_day,
)


def test_ensure_columns_adds_typed_nulls(spark):
    df = spark.createDataFrame([(1,)], "a int")
    out = ensure_columns(df, {"a": "int", "b": "string", "c": "bigint"})
    assert dict(out.dtypes) == {"a": "int", "b": "string", "c": "bigint"}
    assert out.collect()[0]["b"] is None


def test_conditional_overwrite_empty_only(spark):
    df = spark.createDataFrame(
        [("", "n1"), ("keep", "n2"), (None, "n3")], "description string, name string"
    )
    out = {r["name"]: r["description"] for r in conditional_overwrite(df, "description", "name").collect()}
    assert out == {"n1": "n1", "n2": "keep", "n3": None}  # null stays null (§7.3.6)


def test_epoch_and_time_of_day(spark):
    df = spark.createDataFrame([(1600000000,)], "e long")
    row = df.select(
        epoch_to_ts("e").alias("ts"), time_of_day(epoch_to_ts("e")).alias("tod")
    ).collect()[0]
    assert row["ts"].strftime("%Y-%m-%d %H:%M:%S") == "2020-09-13 12:26:40"
    assert row["tod"] == "12:26:40"


def test_keyed_dedup_deterministic_across_layout(spark):
    data = [(1, "b"), (1, "a"), (2, "z"), (2, "y"), (2, "x")]
    df = spark.createDataFrame(data, "k int, v string")
    out1 = sorted(map(tuple, keyed_dedup(df, ["k"]).collect()))
    out2 = sorted(map(tuple, keyed_dedup(df.repartition(5), ["k"]).collect()))
    assert out1 == out2 == [(1, "a"), (2, "x")]


def test_assert_no_duplicates_raises(spark):
    ok = spark.createDataFrame([(1,), (2,)], "a int")
    assert_no_duplicates(ok)
    bad = spark.createDataFrame([(1,), (1,)], "a int")
    with pytest.raises(ValidationError, match="Duplicate"):
        assert_no_duplicates(bad)


def test_assert_no_nulls_with_exempt_columns(spark):
    df = spark.createDataFrame([(1, None)], "a int, b string")
    assert_no_nulls(df, ["a"])  # exempting b passes (facts.py:53 pattern)
    with pytest.raises(ValidationError, match="NaN/Null"):
        assert_no_nulls(df)
