"""Corrupt bronze input must FAIL the dependent branches, not silently
produce empty tables (found by verification probing; SURVEY.md §1.4
permissive-mode + _corrupt_record contract)."""

import datetime

from rustcheatersdatapipeline_spark.pipeline import run_batch

from .fixtures import write_fixtures

INTERVAL_END = datetime.datetime(2022, 1, 15, 12, 0, 0)


def test_corrupt_bronze_fails_branch(spark, tmp_path):
    paths = write_fixtures(tmp_path)
    with open(paths["player_stats"], "w") as fh:
        fh.write("{this is not json")
    res = run_batch(spark, str(tmp_path), INTERVAL_END)
    assert "stats_dim" in res.failed and "stats_fact" in res.failed
    assert "corrupt" in res.failed["stats_dim"]
    assert not res.succeeded
