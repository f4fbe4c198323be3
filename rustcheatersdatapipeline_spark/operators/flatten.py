"""JSON flattening (SURVEY.md §2.2 P1/P2/P16).

The reference calls pd.json_normalize(record_path=..., meta=...) 16
times and pre-repairs missing keys with `[{}]` placeholders
(rust_twitter_steam_dims.py:94-96). In Spark the same semantics are one
``explode_outer`` chain: null arrays yield a null row set, which the
downstream null-drop (P8) removes — identical end state, no repair code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_wrapper(
    df: DataFrame,
    record_path: list[str],
    meta: dict[str, str] | None = None,
    outer: bool = True,
) -> DataFrame:
    """Explode the reference's ``{"responses": [...]}`` wrapper along
    ``record_path``, carrying ``meta`` columns onto each row (P2).

    ``record_path[0]`` is the wrapper array ("responses"); later hops
    are struct fields or nested arrays (arrays are exploded, structs are
    plain field access — the chain fuses into one codegen stage).
    ``meta`` maps output name → path RELATIVE TO the response element
    (e.g. ``{"steam_id": "queried_steam_id",
    "game_name": "playerstats.gameName"}``) — every meta the reference
    uses is response-level (SURVEY.md §2.2 P2).
    """
    explode = F.explode_outer if outer else F.explode
    out = df.withColumn("_r", explode(F.col(record_path[0])))
    cur = "_r"
    for i, hop in enumerate(record_path[1:]):
        ref = F.col(f"{cur}.{hop}")
        dtype = out.select(ref.alias("_probe")).schema[0].dataType.typeName()
        nxt = f"_x{i}"
        out = out.withColumn(nxt, explode(ref) if dtype == "array" else ref)
        cur = nxt
    metas = [F.col(f"_r.{path}").alias(name) for name, path in (meta or {}).items()]
    leaf = out.select(*metas, F.col(cur).alias("_leaf"))
    leaf_fields = [F.col(f"_leaf.{f.name}") for f in leaf.schema["_leaf"].dataType.fields]
    return leaf.select(*[F.col(name) for name in (meta or {})], *leaf_fields)
