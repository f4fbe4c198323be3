"""DuckDB-oracle differential + behavior tests for sparse retrieval
(BM25 search, TF-IDF keywords) — ``plans/retrieval.py``."""

import pytest

from rustcheatersdatapipeline_spark.plans import retrieval as R


from .helpers import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(R.TESTS_ONLY_ORACLE_SQL))
def test_retrieval_matches_oracle(spark, ddb, sf_dir, name):
    df = R.TESTS_ONLY_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ddb, R.TESTS_ONLY_ORACLE_SQL[name], name)


def test_bm25_topk_shape(spark, sf_dir):
    rows = R.bm25_search(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # every probe document yields a result list (its own terms always hit)
    assert sorted(by_q) == list(range(R.BM25_QUERY_MAX_ID))
    for q, rs in by_q.items():
        assert len(rs) <= R.BM25_TOPK
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score_scaled"] for r in rs]
        assert scores == sorted(scores, reverse=True)  # monotone by rank
        assert all(s >= 0 for s in scores)  # Lucene idf variant is >= 0


def test_tfidf_topterms_shape(spark, sf_dir):
    df = R.tfidf_topterms(spark, sf_dir)
    rows = df.collect()
    from rustcheatersdatapipeline_spark.catalog import table

    n_docs = table(spark, sf_dir, "documents").count()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["term"])
    assert len(per_doc) == n_docs  # every document gets keywords
    assert all(len(t) <= R.TFIDF_TOPK for t in per_doc.values())
    assert all(len(set(t)) == len(t) for t in per_doc.values())  # distinct terms
