"""Domain-level boilerplate removal — the crawl-curation pass between
HTML→text distillation and dedup/quality filtering.

Web text carries per-site template lines (navigation, cookie banners,
footers) that document-level dedup cannot touch (every PAGE is unique;
the LINES repeat). The standard fix (public method — the frequency
heuristic behind boilerpipe/trafilatura-style pipelines and the
C4/CCNet line-dedup pass): a line occurring in more than a threshold
fraction of a site's documents is template, not content — strip it
everywhere and reassemble the documents.

Scale shape (corpus-linear, no pairwise anything):

1. explode documents into (group, line, pos) — narrow, no shuffle;
2. per-(group, line-hash) distinct-doc counts — ONE shuffle, map-side
   combinable, keyed on content hash (uniform);
3. group sizes ride the same aggregate via a window on group;
4. anti-join frequent lines back — shuffle keyed the same way, AQE
   broadcasts the (small) frequent-line set when it fits;
5. order-pinned reassembly: one groupBy(doc) with ``sort_array`` over
   (pos, line) structs — exact original line order, deterministic.

Everything is codegen'd ``pyspark.sql.functions``; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: a line is boilerplate within a group when it appears in >= this
#: fraction of the group's documents (and the group has enough docs to
#: make frequency meaningful)
BOILERPLATE_FRAC = 0.5
MIN_GROUP_DOCS = 3

#: schema of the mergeable per-site evidence rows (``lh`` NULL rows
#: carry group doc counts) — what the persisted boilerplate index stores
BP_STATS_SCHEMA = "grp string, lh long, n long"


def line_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Boilerplate evidence for one document set, as SUM-mergeable rows
    ``(grp, lh, n)``: one row per (group, line-hash) with its distinct-
    doc count, plus one row per group with ``lh`` NULL carrying the
    group's distinct-doc count. Counts are additive over disjoint
    document sets, so per-batch deltas appended to a persisted index
    merge exactly (frequent_from_stats sums them) — the log-structured
    counter shape. Blank lines are excluded (they are never template)."""
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), "\n")).alias("_line"),
    )
    line_rows = (
        lines.filter(F.trim("_line") != "")
        .groupBy("grp", F.xxhash64("_line").alias("lh"))
        .agg(F.count_distinct("_id").alias("n"))
    )
    size_rows = (
        docs.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count_distinct(F.col(id_col)).alias("n"))
        .select("grp", F.lit(None).cast("long").alias("lh"), "n")
    )
    return line_rows.unionByName(size_rows)


def frequent_from_stats(
    stats: DataFrame,
    frac: float = BOILERPLATE_FRAC,
    min_docs: int = MIN_GROUP_DOCS,
) -> DataFrame:
    """(grp, lh) template lines implied by (possibly multi-delta)
    evidence rows: SUM-merge the counts, then apply the frequency
    threshold. Works identically on one batch's stats and on a persisted
    index holding many appended deltas."""
    sizes = (
        stats.filter(F.col("lh").isNull()).groupBy("grp").agg(F.sum("n").alias("_gdocs"))
    )
    counts = (
        stats.filter(F.col("lh").isNotNull())
        .groupBy("grp", "lh")
        .agg(F.sum("n").alias("_n"))
    )
    return (
        counts.join(sizes, "grp")
        .filter(
            (F.col("_gdocs") >= F.lit(min_docs))
            & (F.col("_n") * F.lit(1.0) >= F.col("_gdocs") * F.lit(frac))
        )
        .select("grp", "lh")
    )


def strip_lines(
    docs: DataFrame,
    frequent: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Strip an EXPLICIT ``(grp, lh)`` template set from documents.

    Returns ``(id_col, group_col, text_col, n_lines, n_removed)`` with
    each document rebuilt from its surviving lines in original order
    (empty string when every line was template). The template set may
    come from this batch (remove_boilerplate), or from the cumulative
    persisted index plus the batch delta (streaming crawl sink)."""
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_grp"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_lh", F.xxhash64("_line"))
    freq = frequent.select(F.col("grp").alias("_grp"), F.col("lh").alias("_lh"))
    kept = lines.join(freq, ["_grp", "_lh"], "left_anti")
    rebuilt = kept.groupBy("_id", "_grp").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("_text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    totals = lines.groupBy("_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        docs.select(F.col(id_col), F.col(group_col))
        .join(totals.withColumnRenamed("_id", id_col), id_col, "left")
        .join(
            rebuilt.withColumnRenamed("_id", id_col).withColumnRenamed("_grp", group_col),
            [id_col, group_col],
            "left",
        )
        .select(
            id_col,
            group_col,
            F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            (
                F.coalesce(F.col("n_lines"), F.lit(0))
                - F.coalesce(F.col("_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


def remove_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    frac: float = BOILERPLATE_FRAC,
    min_docs: int = MIN_GROUP_DOCS,
) -> DataFrame:
    """Documents with per-group template lines stripped (frequency
    measured WITHIN ``docs`` — the one-shot batch form; the streaming
    sink feeds ``strip_lines`` the cumulative persisted evidence
    instead).

    Returns ``(id_col, group_col, text_col, n_lines, n_removed)``.
    Groups smaller than ``min_docs`` are left untouched — frequency
    carries no signal there. Blank lines never count as boilerplate
    (they carry no content either way) but are preserved in surviving
    text."""
    frequent = frequent_from_stats(
        line_stats(docs, id_col, text_col, group_col), frac, min_docs
    )
    return strip_lines(docs, frequent, id_col, text_col, group_col)
