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


def test_script_mix_planted_labels(spark):
    """The synthetic corpus is all-Latin, so the dominant-script logic
    is exercised on planted docs: CJK- and Cyrillic-dominant texts,
    the han-wins-tie rule, digits-only, and empty."""
    from rustcheatersdatapipeline_spark.plans.training import script_mix_frame

    docs = spark.createDataFrame(
        [
            (1, "hello plain english words"),
            (2, "\u4e2d\u6587\u6587\u6863\u5185\u5bb9 ok"),   # han-dominant
            (3, "\u0440\u0443\u0441\u0441\u043a\u0438\u0439 \u0442\u0435\u043a\u0441\u0442"),  # cyrillic
            (4, "\u4e00\u4e8cab"),                      # 2 han vs 2 latin: han wins tie
            (5, "123456"),
            (6, ""),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["script"] for r in script_mix_frame(docs).collect()}
    assert got == {1: "latin", 2: "han", 3: "cyrillic", 4: "han", 5: "digit", 6: "none"}
    counts = {r["doc_id"]: r["n_han"] for r in script_mix_frame(docs).collect()}
    assert counts[2] == 6 and counts[4] == 2


@pytest.mark.slow
def test_bloom_prefilter_is_exact_and_selective(spark, sf_dir):
    """decontaminate_bloom ≡ decontaminate (no false negatives by
    construction), and the scan-side filter actually prunes — the
    candidate volume must be a small fraction of the corpus grams."""
    from rustcheatersdatapipeline_spark.functions.text import char_shingles
    from rustcheatersdatapipeline_spark.catalog import table as _table
    from pyspark.sql import functions as F

    a = {tuple(r) for r in T.decontaminate(spark, sf_dir).collect()}
    b = {tuple(r) for r in T.decontaminate_bloom(spark, sf_dir).collect()}
    assert a == b and a

    docs = _table(spark, sf_dir, "documents")
    grams = char_shingles(docs, "text", "doc_id", k=13)
    bench = grams.filter(F.col("doc_id") < 10).select(F.col("g").alias("bg")).distinct()
    words = T._bloom_words(bench, "bg")
    corpus = grams.filter(F.col("doc_id") >= 10)
    total = corpus.count()
    cand = corpus.filter(T._bloom_might_contain(words, "g")).count()
    true_hits = corpus.join(bench, F.col("g") == F.col("bg"), "left_semi").count()
    assert cand >= true_hits            # no false negatives
    fp = (cand - true_hits) / max(total - true_hits, 1)
    assert fp < 0.05                    # the 32 KiB filter prunes ≥95%


def test_dedup_substrings_exact_boundaries_and_merging(spark):
    """Constructed corpus: arbitrary-length exact-substring spans get
    EXACT token boundaries (including duplicates straddling dedup_spans'
    fixed SPAN_W chunk grid), overlapping/adjacent runs merge into one
    maximal island, and separated runs stay separate islands."""
    from rustcheatersdatapipeline_spark.plans.training import (
        SUBSTR_W,
        dedup_substrings,
    )

    def words(prefix, n):
        return [f"{prefix}{i}" for i in range(n)]

    shared = words("dup", 24)           # a 24-token repeated block
    shared2 = words("other", 16)        # exactly W tokens, elsewhere
    doc0 = words("a", 7) + shared + words("b", 9) + shared2
    # doc1 repeats `shared` at a DIFFERENT offset (straddles any fixed
    # chunk grid) and `shared2` later, separated by unique filler
    doc1 = words("c", 3) + shared + words("d", 30) + shared2 + words("e", 2)
    rows = [
        (0, " ".join(doc0), "en", "s", 1),
        (1, " ".join(doc1), "en", "s", 1),
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = [
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in dedup_substrings(spark, td).collect()
        ]
    # doc0 is first by (doc_id, pos) everywhere -> no spans; doc1's
    # copies are duplicates with exact extents: `shared` covers tokens
    # [3, 27), `shared2` covers [57, 73) (3+24+30=57)
    assert got == [(1, 3, 3 + 24), (1, 57, 57 + 16)]
    assert (3 + 24 - 3) > SUBSTR_W  # first span is LONGER than W: runs merge
