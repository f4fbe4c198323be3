"""DuckDB-oracle differential tests for the training-data query suite."""

import pytest

from rustcheatersdatapipeline_spark.plans import training as T

from .helpers import assert_matches_oracle


_ALL_QUERIES = {**T.SPARK_QUERIES, **T.TESTS_ONLY_QUERIES}
_ALL_ORACLES = {**T.ORACLE_SQL, **T.TESTS_ONLY_ORACLE_SQL}


@pytest.mark.parametrize("name", sorted(_ALL_ORACLES))
def test_training_matches_oracle(spark, ddb, sf_dir, name):
    df = _ALL_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ddb, _ALL_ORACLES[name], name)


def test_ann_lsh_buckets_runs(spark, sf_dir):
    rows = T.ann_lsh_buckets(spark, sf_dir).collect()
    assert 0 < len(rows) <= 256  # 8-bit signature space
    total = sum(r["n_vecs"] for r in rows)
    from rustcheatersdatapipeline_spark.catalog import table

    assert total == table(spark, sf_dir, "embeddings").count()  # every vector bucketed
