"""Semantic post-conditions for the curation/packing operators —
properties the oracle hash-compare can't express directly."""

from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.plans.training import (
    curate_corpus,
    pack_sequences,
    simhash_neardup,
)


def test_curated_set_is_near_dup_free_and_decontaminated(spark, sf_dir):
    """No two surviving docs may be SimHash near-duplicates of each
    other, no survivor may carry >=100 shared benchmark grams, and the
    benchmark slice itself (doc_id < 10) must be gone."""
    kept = {r["doc_id"] for r in curate_corpus(spark, sf_dir).collect()}
    assert kept and all(d >= 10 for d in kept)

    pairs = simhash_neardup(spark, sf_dir).collect()
    both_kept = [
        (p["doc_a"], p["doc_b"])
        for p in pairs
        if p["doc_a"] in kept and p["doc_b"] in kept
    ]
    assert both_kept == []

    from rustcheatersdatapipeline_spark.plans.training import decontaminate

    heavy = {
        r["doc_id"]
        for r in decontaminate(spark, sf_dir)
        .filter(F.col("n_shared_grams") >= 100)
        .collect()
    }
    assert kept & heavy == set()


def test_pack_sequences_window_invariants(spark, sf_dir):
    """Offsets stay inside the window; within a source, token spans are
    contiguous (doc N+1 starts exactly where doc N ended) and pack ids
    never decrease."""
    rows = pack_sequences(spark, sf_dir).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r["doc_id"])
        expected_start = 0
        prev_pack = 0
        for r in docs:
            assert 0 <= r["offset"] < 512, (source, r)
            start = r["pack_id"] * 512 + r["offset"]
            assert start == expected_start, (source, r)
            assert r["pack_id"] >= prev_pack
            assert r["straddles"] == int(r["offset"] + r["n_tok"] > 512)
            expected_start += r["n_tok"]
            prev_pack = r["pack_id"]
