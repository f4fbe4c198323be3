"""Unicode text normalization — the one text op that earns a Python UDF.

Corpus curation canonicalizes text before hashing/dedup/tokenization:
NFKC folds full-width forms, ligatures and compatibility characters
("ﬁ" → "fi", "Ｈｅｌｌｏ" → "Hello"), casefold handles locale-free
lowering ("ß" → "ss"), and whitespace collapse makes shingle hashes
insensitive to formatting. Without it, visually identical documents
hash apart and every dedup operator under-recalls.

Spark has no built-in Unicode normalizer (lower/translate cover ASCII
only), so this is a legitimate Arrow boundary: a vectorized
``pandas_udf`` calling ``unicodedata.normalize`` per Arrow batch —
NOT a row-at-a-time Python UDF. Everything around it (the regex
whitespace collapse, trim) stays in codegen.

At 100 TB the normalizer is a map-only pass fused into the scan stage:
no shuffle, no state, scales embarrassingly. Determinism: unicodedata
tracks the UCD version of the running CPython — pin the Python minor
version across the fleet (standard Spark practice) and the output is
bit-stable.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_UDF_CACHE: dict[str, object] = {}


def _nfkc_casefold_udf():
    """Build the vectorized UDF lazily — pandas_udf registration needs
    an active SparkSession, so module import must not trigger it."""
    if "nfkc" not in _UDF_CACHE:

        def fn(s: pd.Series) -> pd.Series:
            return s.map(
                lambda t: unicodedata.normalize("NFKC", t).casefold()
                if t is not None
                else None
            )

        _UDF_CACHE["nfkc"] = pandas_udf(fn, "string")
    return _UDF_CACHE["nfkc"]


def normalize_text(col: str | Column, collapse_ws: bool = True) -> Column:
    """NFKC + casefold (Arrow-vectorized) with codegen whitespace
    collapse/trim layered on top."""
    c = F.col(col) if isinstance(col, str) else col
    out = _nfkc_casefold_udf()(c)
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def normalize_documents(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Append the canonical form — run BEFORE hashing/shingling so
    dedup sees canonical bytes."""
    return docs.withColumn(out_col, normalize_text(text_col))
