"""Edge-case contracts for functions/text.py primitives.

Pins the short-document guard in ``char_shingles``: Spark's
``sequence(lo, hi)`` descends when hi < lo, so an unguarded bound would
emit truncated partial shingles for docs shorter than k — silently
diverging from the SQL oracles (which generate positions 1..len-k+1 and
therefore none). See ADVICE round 1.
"""

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
