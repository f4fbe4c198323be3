"""Distributed Misra-Gries heavy hitters (plans/training.py
heavy_hitters): the classical guarantees, checked against exact counts."""

from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.functions.text import token_explode
from rustcheatersdatapipeline_spark.plans.training import MG_CAPACITY, heavy_hitters


def test_mg_guarantees_vs_exact_counts(spark, sf_dir):
    tok = token_explode(table(spark, sf_dir, "documents"), "text", "doc_id")
    exact = {
        r["w"]: r["c"]
        for r in tok.groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(exact.values())
    bound = n / (MG_CAPACITY + 1)

    est = {r["w"]: r["est"] for r in heavy_hitters(spark, sf_dir).collect()}
    assert est, "summaries must be non-empty"

    # est never exceeds truth; undercount bounded by n/(m+1)
    for w, e in est.items():
        assert e <= exact[w], (w, e, exact[w])
        assert exact[w] - e <= bound, (w, e, exact[w], bound)

    # completeness: every token with true frequency > n/(m+1) survives
    heavy = {w for w, c in exact.items() if c > bound}
    assert heavy, "corpus must have at least one heavy token"
    missing = heavy - set(est)
    assert not missing, missing


def test_mg_summary_is_bounded(spark, sf_dir):
    """The merged candidate set must stay metadata-sized:
    ≤ capacity × shuffle partitions."""
    rows = heavy_hitters(spark, sf_dir).count()
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert rows <= MG_CAPACITY * max(n_part, 32)
