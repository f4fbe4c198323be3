"""Incremental dedup against a persisted index
(operators/incremental.py) vs a pure-Python replica oracle.

The oracle recomputes the md5 digests, portable shingle hashes, MinHash
permutations, banding and agreement estimate from scratch in Python —
the engines share only the committed literals (MINHASH_PERMS, PRIME),
so a drift in any stage of the Spark plan surfaces as a mismatch."""

import hashlib

import pytest

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.functions.similarity import (
    MINHASH_BAND_ROWS,
    MINHASH_PERMS,
)
from rustcheatersdatapipeline_spark.functions.text import PRIME
from rustcheatersdatapipeline_spark.operators.incremental import (
    EST_JACCARD_THRESHOLD,
    build_dedup_index,
    dedup_incremental,
    match_against_index,
)

K = 9


def _py_sig(text):
    sh = {text[i : i + K] for i in range(len(text) - K + 1)}
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % PRIME for g in sh]
    if not hs:
        return None
    return [min((a * h + b) % PRIME for h in hs) for a, b in MINHASH_PERMS]


def _py_bands(sig):
    r = MINHASH_BAND_ROWS
    return {
        (j, "-".join(str(m) for m in sig[r * j : r * (j + 1)]))
        for j in range(len(sig) // r)
    }


def _py_matches(new_texts, index_texts):
    """Expected (new_id, index_id, kind) set, replicating the operator
    spec end-to-end in Python."""
    idx = {
        i: (hashlib.md5(t.encode()).hexdigest(), _py_sig(t))
        for i, t in index_texts.items()
    }
    out = set()
    for ni, nt in new_texts.items():
        nd, ns = hashlib.md5(nt.encode()).hexdigest(), _py_sig(nt)
        for ii, (id_, is_) in idx.items():
            if nd == id_:
                out.add((ni, ii, "exact"))
            elif (
                ns is not None
                and is_ is not None
                and _py_bands(ns) & _py_bands(is_)
                and sum(a == b for a, b in zip(ns, is_)) / len(ns)
                >= EST_JACCARD_THRESHOLD
            ):
                out.add((ni, ii, "near"))
    return out


@pytest.fixture(scope="module")
def corpora(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(40)
        .collect()
    )
    index_texts = {r["doc_id"]: r["text"] for r in rows}
    base = list(index_texts.items())
    new_texts = {
        1001: base[0][1],  # verbatim copy → exact (and trivially near)
        1002: base[1][1][:-5] + "XYZQW",  # light edit → near
        1003: base[2][1].replace(" ", "  ", 3),  # light edit → near-ish
        1004: "completely fresh document text about nothing in the corpus",
        1005: "short",  # sub-k: digest only, no signature
        1006: base[3][1],  # another verbatim copy
    }
    return index_texts, new_texts


def test_matches_equal_python_replica(spark, corpora):
    index_texts, new_texts = corpora
    index = build_dedup_index(
        spark.createDataFrame(list(index_texts.items()), "doc_id long, text string"),
        k=K,
    )
    new_df = spark.createDataFrame(list(new_texts.items()), "doc_id long, text string")
    got = {
        (r["new_id"], r["index_id"], r["kind"])
        for r in match_against_index(new_df, index, k=K).collect()
    }
    assert got == _py_matches(new_texts, index_texts)
    assert any(k == "exact" for _, _, k in got)
    assert any(k == "near" for _, _, k in got)


def test_dedup_incremental_keeps_only_novel(spark, corpora):
    index_texts, new_texts = corpora
    index = build_dedup_index(
        spark.createDataFrame(list(index_texts.items()), "doc_id long, text string"),
        k=K,
    )
    new_df = spark.createDataFrame(list(new_texts.items()), "doc_id long, text string")
    kept = {r["doc_id"] for r in dedup_incremental(new_df, index, k=K).collect()}
    matched = {ni for ni, _, _ in _py_matches(new_texts, index_texts)}
    assert kept == set(new_texts) - matched
    assert 1004 in kept and 1005 in kept  # fresh + sub-k unmatched survive
    assert 1001 not in kept and 1006 not in kept  # verbatim copies dropped


def test_estimator_accuracy_on_verbatim_copy(spark, corpora):
    """A verbatim copy must match with est_jaccard == 1.0 on the near
    path too (identical signatures agree on every permutation)."""
    index_texts, _ = corpora
    index = build_dedup_index(
        spark.createDataFrame(list(index_texts.items()), "doc_id long, text string"),
        k=K,
    )
    copy_of_first = next(iter(index_texts.values()))
    new_df = spark.createDataFrame([(2001, copy_of_first)], "doc_id long, text string")
    rows = match_against_index(new_df, index, k=K).collect()
    assert {r["kind"] for r in rows} == {"exact"}
    assert all(r["est_jaccard"] == 1.0 for r in rows)
