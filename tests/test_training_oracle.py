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


def test_script_mix_is_nonvacuous(spark, sf_dir):
    """The synthetic corpus carries CJK language markers — the dominant-
    script label must actually vary (the differential alone would pass
    on an all-'latin' corpus)."""
    rows = T.script_mix(spark, sf_dir).collect()
    labels = {r["script"] for r in rows}
    assert "latin" in labels and "han" in labels
    han = next(r for r in rows if r["script"] == "han")
    assert han["n_han"] >= han["n_latin"]
