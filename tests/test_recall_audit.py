"""Approx-vs-exact recall audits: the approximate operators are only
useful at scale if their recall against the exact baselines is
measured and floored. Everything here is deterministic (fixed planes,
fixed permutations, fixed data), so the floors cannot flake — they pin
regressions in the parameter-derivation logic."""

from rustcheatersdatapipeline_spark.plans import training as T


def test_minhash_lsh_pair_recall_vs_exact(spark, sf_dir):
    """MinHash banding + exact verify must find (nearly) every j ≥ 0.8
    pair the exact PPJoin finds; precision is 1.0 by construction (the
    verify step recomputes exact Jaccard)."""
    exact = {(r["doc_a"], r["doc_b"]) for r in T.dedup_ngram_jaccard(spark, sf_dir).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in T.dedup_minhash_lsh(spark, sf_dir).collect()}
    assert exact, "exact pair set must be non-vacuous"
    assert lsh <= exact  # verified candidates can never be false positives
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.95, f"minhash pair recall {recall:.3f}"


def test_ann_lsh_recall_at_5_vs_bruteforce(spark, sf_dir):
    """Multi-table hyperplane LSH vs the exact top-5: the derived plane
    count (bucket occupancy ≈ LSH_TARGET_BUCKET) plus LSH_TABLES-way
    OR-amplification must clear a 0.5 recall floor on this corpus.
    (Single fixed-width, single-table bucketing measured ≈ 0 recall —
    the regression this test exists to catch.)"""
    knn: dict = {}
    for r in T.embed_knn_bruteforce(spark, sf_dir).collect():
        knn.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ann: dict = {}
    for r in T.ann_lsh_search(spark, sf_dir).collect():
        ann.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(ann.get(q, set()) & n) for q, n in knn.items())
    total = sum(len(n) for n in knn.values())
    assert total > 0
    recall = hits / total
    assert recall >= 0.5, f"ann recall@5 {recall:.3f}"


def test_multiprobe_lifts_ann_recall(spark, sf_dir):
    """Hamming-1 multi-probe (Lv et al., VLDB'07) must dominate the
    plain bucket search and clear a higher floor — the documented
    recall/candidates trade (measured 0.66 → 0.99 on this corpus)."""
    knn: dict = {}
    for r in T.embed_knn_bruteforce(spark, sf_dir).collect():
        knn.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    total = sum(len(n) for n in knn.values())

    def recall(fn):
        ann: dict = {}
        for r in fn(spark, sf_dir).collect():
            ann.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(ann.get(q, set()) & n) for q, n in knn.items()) / total

    plain = recall(T.ann_lsh_search)
    multi = recall(T.ann_lsh_search_multiprobe)
    assert multi >= plain, (multi, plain)
    # floor pinned at 0.95 (measured 0.99 on this corpus) so the
    # recommended-for-production multiprobe path cannot silently rot
    # back toward the 0.66 single-probe recall
    assert multi >= 0.95, f"multiprobe recall@5 {multi:.3f}"


def test_pq_rerank_lifts_recall_vs_exact_l2(spark, sf_dir):
    """Raw ADC top-5 is quantization-bound (measured ≈ 0.23 on this
    structureless synthetic corpus — PQ's worst case); the production
    rerank stage (exact L2 over the ADC top-200 shortlist) must clear
    0.9 while reading full vectors only for the shortlist."""
    import numpy as np

    from rustcheatersdatapipeline_spark.plans import training as T

    rows = T._vectors(spark, sf_dir).collect()
    E = {r["vec_id"]: np.array(r["e"]) for r in rows}
    ids = sorted(E)
    X = np.stack([E[i] for i in ids])
    exact = {}
    for q in [i for i in ids if i < T.KNN_QUERY_MAX_ID]:
        dist = np.sum((X - E[q]) ** 2, axis=1)
        exact[q] = set([ids[j] for j in np.argsort(dist) if ids[j] != q][: T.KNN_K])

    def recall(fn):
        got = {}
        for r in fn(spark, sf_dir).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
        return hits / (T.KNN_K * len(exact))

    raw = recall(T.ann_pq_search)
    reranked = recall(T.ann_pq_rerank)
    assert reranked >= 0.9, f"pq rerank recall@5 {reranked:.3f}"
    assert reranked > raw + 0.3, f"rerank lift {raw:.3f} -> {reranked:.3f}"
