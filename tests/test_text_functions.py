"""Edge-case contracts for functions/text.py primitives.

Pins the short-document guard in ``char_shingles``: Spark's
``sequence(lo, hi)`` descends when hi < lo, so an unguarded bound would
emit truncated partial shingles for docs shorter than k — silently
diverging from the SQL oracles (which generate positions 1..len-k+1 and
therefore none). See ADVICE round 1.
"""

import pytest

from rustcheatersdatapipeline_spark.functions.text import char_shingles


def _shingles(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return sorted(map(tuple, char_shingles(df, "text", "doc_id", k=k).collect()))


def test_short_doc_yields_no_shingles(spark):
    got = _shingles(spark, [("d1", "abcd")], k=9)
    assert got == []


def test_empty_and_exact_length_docs(spark):
    got = _shingles(spark, [("d0", ""), ("d1", "abc"), ("d2", "abcd")], k=3)
    assert got == [("d1", "abc"), ("d2", "abc"), ("d2", "bcd")]


def test_shingle_positions_are_full_width(spark):
    """Every emitted shingle has exactly width k (no truncated tails)."""
    rows = [("d0", ""), ("d1", "ab"), ("d2", "abcdef")]
    got = _shingles(spark, rows, k=3)
    assert got == [("d2", "abc"), ("d2", "bcd"), ("d2", "cde"), ("d2", "def")]
    assert all(len(g) == 3 for _, g in got)


def test_repetition_metrics_planted(spark, tmp_path):
    """Gopher repetition signals on PLANTED repetitive docs (the
    synthetic corpus is single-line and 5-gram-clean, so the oracle
    differential alone leaves dup_line/dup_5gram vacuous): exact
    fractions verified against hand-computed values."""
    from rustcheatersdatapipeline_spark.plans.training import repetition_metrics

    body = "alpha beta gamma delta epsilon zeta"
    docs = [
        # doc 1: 4 lines, "nav bar" repeated twice -> dup_line_frac 2/4
        (1, "nav bar\n" + body + "\nnav bar\nunique closing line"),
        # doc 2: clean prose, no repetition
        (2, "every word here appears exactly once in this document"),
        # doc 3: one 5-gram repeated: "a b c d e" twice
        (3, "a b c d e x y z w v a b c d e"),
        # doc 4: pathological spam: same 2-gram everywhere
        (4, "buy now " * 20),
    ]
    frame = spark.createDataFrame(
        [(i, t, None, "t", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    frame.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in repetition_metrics(spark, str(tmp_path)).collect()}

    assert out[1]["dup_line_frac"] == pytest.approx(2 / 4)
    dup_chars = 2 * len("nav bar")
    line_chars = sum(len(l) for l in docs[0][1].split("\n"))
    assert out[1]["dup_line_char_frac"] == pytest.approx(dup_chars / line_chars)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["dup_5gram_char_frac"] == 0.0
    # doc 3: the repeated 5-gram "a b c d e" covers 2*9 chars
    assert out[3]["dup_5gram_char_frac"] == pytest.approx(2 * 9 / len(docs[2][1]))
    # doc 4: "now buy" x19 + "buy now" x19... top 2-gram dominates; the
    # trailing space makes text end with a token boundary — just assert
    # the spam signal is overwhelming vs the clean doc
    assert out[4]["top_2gram_char_frac"] > 0.4
    assert out[4]["dup_5gram_char_frac"] == 1.0  # capped
    assert out[2]["top_2gram_char_frac"] < 0.4
