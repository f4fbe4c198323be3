"""Oracle tests for the analytics queries (multimodal + sessionize),
plus the multimodal stub contract."""

import pytest

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.functions.multimodal import (
    featurize_media,
    media_table,
)
from rustcheatersdatapipeline_spark.plans import analytics as A

from .helpers import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(A.ORACLE_SQL))
def test_analytics_matches_oracle(spark, ddb, sf_dir, name):
    df = A.SPARK_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ddb, A.ORACLE_SQL[name], name)


def test_real_codec_path_is_marked_unimplemented(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    media = media_table(docs, "doc_id", F.encode(F.col("text"), "UTF-8"), "text/plain")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        featurize_media(media, fake=False).collect()
