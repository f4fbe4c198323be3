"""DuckDB-oracle differential + behavior tests for sparse retrieval
(BM25 search, TF-IDF keywords) — ``plans/retrieval.py``."""

import pytest

from rustcheatersdatapipeline_spark.plans import retrieval as R


from .helpers import assert_matches_oracle


_ALL_QUERIES = {**R.SPARK_QUERIES, **R.TESTS_ONLY_QUERIES}
_ALL_ORACLES = {**R.ORACLE_SQL, **R.TESTS_ONLY_ORACLE_SQL}


@pytest.mark.parametrize("name", sorted(_ALL_ORACLES))
def test_retrieval_matches_oracle(spark, ddb, sf_dir, name):
    df = _ALL_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ddb, _ALL_ORACLES[name], name)


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


def test_hybrid_rrf_fuses_both_arms(spark, sf_dir):
    """RRF semantics: every fused score decomposes into the two arms'
    rank contributions, docs surfaced by BOTH arms carry both terms,
    and no self-hit survives fusion."""
    from rustcheatersdatapipeline_spark.plans.retrieval import (
        HYBRID_RRF_K,
        bm25_search,
        hybrid_search_rrf,
    )
    from rustcheatersdatapipeline_spark.plans.training import embed_knn_bruteforce

    fused = hybrid_search_rrf(spark, sf_dir).collect()
    assert fused, "hybrid search returned no rows"
    lex = {
        (r["query_id"], r["doc_id"]): r["rnk"]
        for r in bm25_search(spark, sf_dir).collect()
        if r["doc_id"] != r["query_id"]
    }
    vec = {
        (r["query_id"], r["neighbor_id"]): r["rnk"]
        for r in embed_knn_bruteforce(spark, sf_dir).collect()
        if r["query_id"] < 8 and r["neighbor_id"] != r["query_id"]
    }
    both = 0
    for r in fused:
        key = (r["query_id"], r["doc_id"])
        assert r["doc_id"] != r["query_id"]
        expect = 0
        if key in lex:
            expect += 1000000 // (HYBRID_RRF_K + lex[key])
        if key in vec:
            expect += 1000000 // (HYBRID_RRF_K + vec[key])
        assert expect > 0, f"fused doc {key} in neither arm"
        assert r["rrf_scaled"] == expect
        both += key in lex and key in vec
    # per-query fused ranks are 1..k dense
    by_q = {}
    for r in fused:
        by_q.setdefault(r["query_id"], []).append(r["rnk"])
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
