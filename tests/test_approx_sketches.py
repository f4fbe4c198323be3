"""Approximate-sketch operators (HLL distinct counts, percentile
sketches): no exact oracle by nature, so they're bounded against exact
answers instead — the pattern the engine uses wherever exactness isn't
contractual at 100 TB (a sketch shuffles constant state per group vs a
full distinct shuffle)."""

import pytest
from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.catalog import table


@pytest.mark.slow
def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    exact = ev.select(F.count_distinct("user_id").alias("d")).collect()[0]["d"]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("d")
    ).collect()[0]["d"]
    assert abs(approx - exact) / exact < 0.1


def test_approx_percentile_close_to_exact(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    row = ev.select(
        F.percentile("value", 0.5).alias("exact"),
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 1.0
