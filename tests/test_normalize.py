"""Unicode normalization (functions/normalize.py) vs Python's
unicodedata directly — and the dedup-recall property it exists for."""

import unicodedata

from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.functions.normalize import (
    normalize_documents,
    normalize_text,
)

CASES = [
    ("ﬁre ﬂow", "fire flow"),  # ligatures
    ("Ｈｅｌｌｏ　Ｗｏｒｌｄ", "hello world"),  # full-width + ideographic space
    ("Straße", "strasse"),  # casefold beyond lower()
    ("½ + ¼", "1⁄2 + 1⁄4"),  # compatibility fractions
    ("a b\t\tc\n d", "a b c d"),  # nbsp/tabs/newlines collapse
    ("Nóel", "nóel"),  # combining acute composes (NFKC)
]


def test_normalize_matches_unicodedata(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "id long, text string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", normalize_text("text").alias("n")).collect()
    }
    for i, (raw, expected) in enumerate(CASES):
        want = " ".join(unicodedata.normalize("NFKC", raw).casefold().split())
        assert got[i] == want == expected, (raw, got[i], want)


def test_normalize_null_passthrough_and_plan(spark):
    df = spark.createDataFrame([(1, None), (2, "A  B")], "id long, text string")
    rows = {r["id"]: r["n"] for r in df.select("id", normalize_text("text").alias("n")).collect()}
    assert rows[1] is None and rows[2] == "a b"
    # vectorized Arrow eval, not row-at-a-time BatchEvalPython
    plan = (
        df.select(normalize_text("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_normalization_restores_dedup_recall(spark):
    """Two formatting variants of one document hash apart raw but
    identically after normalization — the under-recall this op fixes."""
    a = "The Quick Brown Fox jumps over the lazy dog"
    b = "Ｔｈｅ Ｑｕｉｃｋ Ｂｒｏｗｎ Ｆｏｘ  jumps\tover the lazy dog"
    df = normalize_documents(
        spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    )
    digests = df.select(
        F.md5("text").alias("raw"), F.md5("text_norm").alias("norm")
    ).collect()
    assert digests[0]["raw"] != digests[1]["raw"]
    assert digests[0]["norm"] == digests[1]["norm"]


def test_with_lang_agrees_with_lang_id_query(spark, sf_dir):
    """The reusable column form must predict exactly what the lang_id
    query predicts, and must never override an existing label."""
    from pyspark.sql import functions as F

    from rustcheatersdatapipeline_spark.catalog import table
    from rustcheatersdatapipeline_spark.functions.text import with_lang
    from rustcheatersdatapipeline_spark.plans.training import lang_id

    docs = table(spark, sf_dir, "documents").limit(300)
    tagged = with_lang(docs.withColumn("lang", F.lit(None).cast("string")))
    got = {r["doc_id"]: r["lang"] for r in tagged.collect()}
    want = {r["doc_id"]: r["lang_pred"] for r in lang_id(spark, sf_dir).collect()}
    assert all(got[d] == want[d] for d in got)

    keep = with_lang(docs.withColumn("lang", F.lit("xx")))
    assert {r["lang"] for r in keep.select("lang").distinct().collect()} == {"xx"}
