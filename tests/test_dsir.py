"""DSIR importance resampling: behavioral properties.

Bit-exactness vs the DuckDB oracle is covered by
tests/test_training_oracle.py (dsir_logweights / dsir_resample); these
tests pin that the method does what the paper promises — selection
shifts toward the target distribution — on planted corpora where the
right answer is unambiguous.
"""

import pytest
from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.plans.training import (
    DSIR_BUCKETS,
    dsir_logweight_frame,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


EN = "the quick brown fox jumps over the lazy dog and runs away home"
NOISE = "zzq xkcd qwop vrbl njkm plof trsk wxyz qqpp mnbv zxcv llkj"


@pytest.mark.slow
def test_target_like_docs_get_higher_weights(spark):
    target = _docs(spark, [(1000 + i, EN) for i in range(5)])
    raw = _docs(
        spark,
        [(i, EN) for i in range(10)] + [(100 + i, NOISE) for i in range(10)],
    )
    w = {
        r["doc_id"]: r["logw_scaled"]
        for r in dsir_logweight_frame(raw, target).collect()
    }
    en_w = [w[i] for i in range(10)]
    noise_w = [w[100 + i] for i in range(10)]
    assert min(en_w) > max(noise_w)


def test_selection_concentrates_on_target_like(spark):
    """Gumbel-max top-k over planted weights: with a large weight gap
    the noise docs are effectively never chosen."""
    target = _docs(spark, [(1000 + i, EN) for i in range(5)])
    raw = _docs(
        spark,
        [(i, EN + f" extra{i}") for i in range(20)]
        + [(100 + i, NOISE + f" extra{i}") for i in range(20)],
    )
    lw = dsir_logweight_frame(raw, target)
    from rustcheatersdatapipeline_spark.functions.text import portable_hash64
    from rustcheatersdatapipeline_spark.plans.training import _WSAMPLE_M, _DSIR_SCALE

    h = portable_hash64(F.concat(F.lit("dg:"), F.col("doc_id").cast("string")))
    u = (F.pmod(h, F.lit(_WSAMPLE_M - 1)) + 1) / F.lit(float(_WSAMPLE_M))
    key = F.col("logw_scaled") + F.floor(F.lit(_DSIR_SCALE) * -F.log(-F.log(u))).cast(
        "bigint"
    )
    picked = [
        r["doc_id"]
        for r in lw.select("doc_id", key.alias("k"))
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(10)
        .collect()
    ]
    assert all(d < 100 for d in picked)


def test_empty_text_drops_out_and_bigrams_count(spark):
    target = _docs(spark, [(1, "a b")])
    raw = _docs(spark, [(1, "a b c"), (2, "")])
    rows = dsir_logweight_frame(raw, target).collect()
    got = {r["doc_id"]: r["n_grams"] for r in rows}
    # "a b c" = 3 unigrams + 2 bigrams; the empty doc has no evidence
    assert got == {1: 5}


def test_bucket_space_is_bounded(spark):
    """The score table the weights join against is ≤ DSIR_BUCKETS rows
    regardless of corpus size — the 100 TB boundedness fact."""
    from rustcheatersdatapipeline_spark.plans.training import _dsir_grams

    raw = _docs(spark, [(i, f"tok{i} tok{i+1} tok{i+2}") for i in range(200)])
    n = (
        _dsir_grams(raw, "text", "doc_id")
        .select("bucket")
        .distinct()
        .count()
    )
    assert n <= DSIR_BUCKETS
