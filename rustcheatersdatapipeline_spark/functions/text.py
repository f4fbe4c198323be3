"""Text-analysis primitives (JVM-side, codegen-friendly).

Cross-engine portability contract: every primitive here has an exact
DuckDB-SQL equivalent (used by the oracle strings in plans/training.py).
The shared building block is ``portable_hash64``:

    Spark : CAST(conv(substr(md5(s),1,15), 16, 10) AS BIGINT)
    DuckDB: ('0x' || substr(md5(s),1,15))::BIGINT

md5 agrees byte-for-byte across engines, 15 hex chars = 60 bits < 63 so
the BIGINT parse can't overflow, and downstream modular arithmetic on
(a*h + b) % P with P = 1e9+7 stays under 2^61 — no wraparound anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Modulus for all hash-derived modular arithmetic (30 bits — products
#: with 30-bit coefficients fit comfortably in int64 on both engines).
PRIME = 1_000_000_007

#: Marker stopwords per language for the n-gram/stopword lang-id
#: heuristic. Order matters: ties resolve in this priority order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "des", "et", "est"),
    "zh": ("de5", "shi4", "zai4", "he2", "you3"),
}

#: English-ish stopwords for the quality score.
STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "that", "it", "for")


def portable_hash64(col: Column) -> Column:
    """60-bit deterministic string hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def char_shingles(
    df, text_col: str, id_col: str, k: int = 3, hash64: bool = False,
    distinct: bool = True,
):
    """Distinct character k-grams per document: (id_col, g).

    ``distinct=False`` skips the per-document dedup — correct (and one
    full shingle shuffle cheaper) for consumers that are multiset-
    insensitive, e.g. MinHash signatures (min over a multiset equals
    min over its set).

    ``hash64=True`` replaces each k-gram with its ``xxhash64`` BEFORE the
    distinct — engine-internal only (xxhash64 is not portable to the SQL
    oracle): int64 shingles shuffle ~2× fewer bytes and compare ~3×
    faster than k-char strings in the downstream joins/intersections,
    and a cross-doc collision (~1e-9 corpus-wide) would surface as an
    oracle mismatch, not silent corruption. Callers needing portable
    hashes (MinHash signatures) must keep strings and apply
    ``portable_hash64`` themselves.

    Expressed as sequence+explode+substring so the whole expansion stays
    in whole-stage codegen (no Python). The input is repartitioned first:
    a document table small enough to arrive as one scan partition would
    otherwise run the ~250× row expansion single-threaded — repartition
    shuffles only the cheap pre-explode rows, never the shingles.

    Documents shorter than k yield zero shingles (pre-filtered: Spark's
    ``sequence(lo, hi)`` DESCENDS when hi < lo, so an unguarded
    ``sequence(1, length-k+1)`` would emit truncated partial shingles
    for short docs that the SQL oracles never produce).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    gram = F.expr(f"substring({text_col}, i, {k})")
    if hash64:
        gram = F.xxhash64(gram)
    out = (
        df.filter(F.length(text_col) >= k)
        .repartition(parallelism, id_col)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.length(text_col) - (k - 1))).alias("i"),
            text_col,
        )
        .select(id_col, gram.alias("g"))
    )
    return out.distinct() if distinct else out


def ws_tokens(text_col: str) -> Column:
    """Whitespace tokens with empties removed (array<string>)."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def token_explode(df, text_col: str, id_col: str):
    """One row per token occurrence (keeps duplicates — SimHash weights
    by occurrence count)."""
    return df.select(id_col, F.explode(ws_tokens(text_col)).alias("w"))


def marker_count(text_col: str, markers: tuple[str, ...]) -> Column:
    """Number of token occurrences that are in ``markers``."""
    return F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x.isin(*markers)))


def lang_pred(text_col: str = "text") -> Column:
    """Marker-stopword language prediction as a single codegen CASE
    column — the same scoring + tie-break rule as the ``lang_id``
    query, reusable anywhere a documents frame needs its ``lang``
    column filled (the distillers emit NULL: detection is a pipeline
    choice, not a parsing fact)."""
    langs = list(LANG_MARKERS)
    score = {lang: marker_count(text_col, m) for lang, m in LANG_MARKERS.items()}
    expr = F.lit(langs[-1])
    for i in range(len(langs) - 2, -1, -1):
        lang = langs[i]
        cond = F.lit(True)
        for other in langs[i + 1 :]:
            cond = cond & (score[lang] >= score[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def with_lang(docs, text_col: str = "text", lang_col: str = "lang"):
    """Documents with ``lang`` filled where NULL (already-tagged rows
    keep their label — detection never overrides provenance)."""
    return docs.withColumn(
        lang_col, F.coalesce(F.col(lang_col), lang_pred(text_col))
    )
