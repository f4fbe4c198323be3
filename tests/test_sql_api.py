"""SQL-API parity: the registered temp-view catalog answers the same
queries through spark.sql as the DataFrame builders (SURVEY.md §2.9
'Spark SQL' mapping)."""

from rustcheatersdatapipeline_spark.catalog import register_views
from rustcheatersdatapipeline_spark.plans import queries as Q


def test_spark_sql_over_views_matches_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    sql_df = spark.sql(
        "SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey "
        "ORDER BY c_nationkey"
    )
    api_df = Q.q22(spark, sf_dir)
    assert sorted(map(tuple, sql_df.collect())) == sorted(map(tuple, api_df.collect()))


def test_views_cover_all_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").count() >= 0
