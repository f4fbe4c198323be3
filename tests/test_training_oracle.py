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
    assert 0 < len(rows) <= 256  # 8-bit signature space
    total = sum(r["n_vecs"] for r in rows)
    from rustcheatersdatapipeline_spark.catalog import table

    assert total == table(spark, sf_dir, "embeddings").count()  # every vector bucketed
