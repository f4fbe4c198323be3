"""Embedding-space incremental dedup (operators/incremental.py
embed_* functions) with a numpy exact-cosine oracle."""

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.operators.incremental import (
    build_embed_index,
    embed_dedup_incremental,
    match_embeddings_against_index,
)

NPLANES = 8
THRESH = 0.98


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(400)
        .collect()
    )
    return {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}


def _new_batch(corpus):
    base = sorted(corpus)
    rng = np.random.default_rng(11)
    out = {}
    for i, vid in enumerate(base[:3]):  # verbatim copies
        out[9001 + i] = corpus[vid].copy()
    for i, vid in enumerate(base[3:5]):  # perturbed copies (cos ≈ 0.9999+)
        v = corpus[vid].copy()
        v[0] += 1e-3
        out[9101 + i] = v
    for i in range(3):  # fresh random vectors
        out[9201 + i] = rng.normal(size=corpus[base[0]].shape[0])
    return out


def _spark_df(spark, vecs):
    return spark.createDataFrame(
        [(int(k), [float(x) for x in v]) for k, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )


def _true_cos(a, b):
    return float(a @ b / np.sqrt((a @ a) * (b @ b)))


def test_matches_are_exact_and_complete(spark, sf_dir, corpus):
    new = _new_batch(corpus)
    # float32 round-trip: compare against what Spark actually stores
    new32 = {k: np.array(np.array(v, dtype=np.float32), dtype=np.float64) for k, v in new.items()}
    idx = build_embed_index(
        _spark_df(spark, corpus), NPLANES
    )
    got = {
        (r["new_id"], r["index_id"])
        for r in match_embeddings_against_index(
            _spark_df(spark, new), idx, NPLANES, threshold=THRESH
        ).collect()
    }
    # no false positives: every returned pair clears the true cosine bar
    for ni, ii in got:
        assert _true_cos(new32[ni], corpus[ii]) >= THRESH - 1e-9

    # completeness for the planted copies: each must match its source
    planted = {9001, 9002, 9003, 9101, 9102}
    matched_new = {ni for ni, _ in got}
    assert planted <= matched_new
    # fresh random vectors match nothing at this threshold
    assert {9201, 9202, 9203}.isdisjoint(matched_new)


def test_embed_dedup_incremental_keeps_only_novel(spark, sf_dir, corpus):
    new = _new_batch(corpus)
    idx = build_embed_index(_spark_df(spark, corpus), NPLANES)
    kept = {
        r["vec_id"]
        for r in embed_dedup_incremental(
            _spark_df(spark, new), idx, NPLANES, threshold=THRESH
        ).collect()
    }
    assert kept == {9201, 9202, 9203}
