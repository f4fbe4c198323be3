"""URL canonicalization and compression-ratio quality signal — two
standard web-corpus curation primitives (public methods: the URL
normalization rules are RFC 3986 §6 plus the conventional tracking-
param strip; the zlib-ratio gibberish/repetition detector is the
RefinedWeb/CCNet-style heuristic).

``canonical_url`` is pure codegen (chained JVM string expressions —
lowercase scheme/host, default-port strip, fragment strip, tracking
params out, query params sorted, trailing-slash normalization): URL
dedup runs at scan throughput with no Python in the loop.
``compression_ratio`` needs zlib, so it is an Arrow ``pandas_udf`` —
the declared Python boundary, batch-vectorized.
"""

from __future__ import annotations

import zlib

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: query parameters that identify a CLICK, not a resource
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "ref", "ref_src",
)


def canonical_url(col: Column | str) -> Column:
    """RFC 3986-style canonical form of a URL column, fully codegen:

    - scheme and host lowercased (path case is significant — kept);
    - explicit default ports (``:80`` http, ``:443`` https) removed;
    - fragment removed;
    - tracking params (``utm_*`` & friends) removed;
    - remaining query params sorted byte-wise (order never identifies a
      resource); empty ``?`` dropped;
    - trailing slash on a bare authority normalized (``http://a.test/``
      ≡ ``http://a.test``).

    Two URLs mapping to the same string fetch the same resource under
    these rules — the join key for URL-level dedup of crawl frontiers.
    """
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    rest = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*:", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    host = F.lower(F.regexp_extract(rest, r"^//([^/?]*)", 1))
    authority = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(rest, r"^//[^/?]*([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).isin(*TRACKING_PARAMS),
    )
    # an empty value is the same parameter as no value: "a=" ≡ "a"
    params = F.transform(params, lambda p: F.regexp_replace(p, "=$", ""))
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def dedup_by_url(docs: DataFrame, url_col: str = "source", id_col: str = "doc_id") -> DataFrame:
    """One survivor (min id, deterministic) per canonical URL — the
    frontier-dedup pass that runs BEFORE fetching/content dedup at
    crawl scale (one hash-keyed aggregate, no content reads)."""
    from pyspark.sql.window import Window

    ranked = docs.withColumn("_cu", canonical_url(url_col)).withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_cu").orderBy(id_col))
    )
    return ranked.filter(F.col("_rn") == 1).drop("_cu", "_rn")


def compression_ratio(col: Column | str) -> Column:
    """len(zlib(text)) / len(text) — the cheap information-density
    signal: highly repetitive/templated text compresses far below
    normal prose (~0.3-0.6), random gibberish sits near (or above) 1.0.
    NULL/empty → NULL (no signal). Arrow ``pandas_udf`` (declared
    lazily — decorating at import time needs an active session)."""

    @F.pandas_udf("double")
    def _ratio(text: pd.Series) -> pd.Series:
        def ratio(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8", "replace")
            return len(zlib.compress(raw, 6)) / len(raw)

        return text.map(ratio)

    return _ratio(F.col(col) if isinstance(col, str) else col)


def quality_compression_flags(
    docs: DataFrame,
    text_col: str = "text",
    low: float = 0.25,
    high: float = 1.05,
) -> DataFrame:
    """Documents annotated with ``compression_ratio`` and a keep flag:
    below ``low`` is template/repetition spam, above ``high`` is
    binary-ish gibberish — the standard two-sided cut."""
    return docs.withColumn("compression_ratio", compression_ratio(text_col)).withColumn(
        "keep_compression",
        (F.col("compression_ratio") >= low) & (F.col("compression_ratio") <= high),
    )


@F.pandas_udf(StringType())
def _resolve(base: pd.Series, ref: pd.Series) -> pd.Series:
    """Resolve a (possibly relative) reference against its page URL with
    stdlib ``urljoin`` — the one Arrow-batched Python step in the link
    and anchor extractors; non-HTTP results drop to NULL."""
    from urllib.parse import urljoin

    def run(b, r):
        if b is None or r is None:
            return None
        try:
            out = urljoin(b, r.strip())
        except ValueError:
            return None
        return out if out.startswith(("http://", "https://")) else None

    return pd.Series([run(b, r) for b, r in zip(base, ref)])


def extract_links(
    pages: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
    max_links_per_page: int = 500,
) -> DataFrame:
    """(base, link) edge rows from raw HTML pages: ``href``/``src``
    attribute values lift JVM-side (``regexp_extract_all`` — the scan
    stays codegen), relative references resolve against the page URL
    with stdlib ``urljoin`` in one Arrow batch step (the declared
    Python boundary), and both ends canonicalize via ``canonical_url``.
    Non-fetchable schemes (mailto/javascript/data/tel) and empty or
    fragment-only references drop. ``max_links_per_page`` bounds the
    explode fan-out so one pathological page cannot skew a partition."""
    refs = F.slice(
        F.regexp_extract_all(
            F.col(html_col), F.lit(r'''(?i)\b(?:href|src)\s*=\s*["']([^"'<>]+)["']'''), 1
        ),
        1,
        max_links_per_page,
    )
    bad = r"(?i)^(mailto|javascript|data|tel):"
    return (
        pages.select(F.col(base_col).alias("_base"), F.explode(refs).alias("_ref"))
        .filter(
            (F.trim("_ref") != "")
            & ~F.trim("_ref").startswith("#")
            & ~F.trim("_ref").rlike(bad)
        )
        .select(
            canonical_url("_base").alias("base"),
            canonical_url(_resolve("_base", "_ref")).alias("link"),
        )
        .filter(F.col("link").isNotNull() & (F.col("link") != F.col("base")))
        .distinct()
    )


def host_graph(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level projection of a
    page link table (self-loops dropped): the input to host-rank
    frontier prioritization. Pure codegen (``parse_url``), one
    aggregate."""
    hosts = links.select(
        F.lower(F.parse_url("base", F.lit("HOST"))).alias("src_host"),
        F.lower(F.parse_url("link", F.lit("HOST"))).alias("dst_host"),
    )
    return (
        hosts.filter(
            F.col("src_host").isNotNull()
            & F.col("dst_host").isNotNull()
            & (F.col("src_host") != "")
            & (F.col("dst_host") != "")
            & (F.col("src_host") != F.col("dst_host"))
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def host_rank(
    links: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-8,
    weighted: bool = False,
) -> DataFrame:
    """(host, rank) — PageRank over the host graph: the standard crawl
    scheduling signal (spend fetch budget on hosts the web links to).
    Unweighted (the default, conventional frontier form) the topology
    alone ranks; ``weighted=True`` makes link multiplicity (n_links)
    count — only meaningful when the edge counts are trustworthy (a
    replayed ingest batch inflates its own edges' counts)."""
    from ..operators.graph import pagerank

    return (
        pagerank(host_graph(links), src="src_host", dst="dst_host",
                 damping=damping, tol=tol,
                 weight="n_links" if weighted else None)
        .select(F.col("node").alias("host"), "rank")
    )


#: anchor elements: href attribute + inner markup up to the closing tag
_ANCHOR_RX = r'''(?is)<a\b[^>]*?href\s*=\s*["']([^"'<>]+)["'][^>]*>(.*?)</a>'''


def extract_anchors(
    pages: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
    max_anchors_per_page: int = 500,
) -> DataFrame:
    """(base, link, anchor) rows from raw HTML pages — the anchor-TEXT
    signal the link extractor drops: what other pages CALL a document is
    a classic relevance/label source for pretraining and retrieval
    corpora (public technique — anchor text has powered web ranking
    since WWW7's Google paper).

    The element scan is one JVM regex applied twice (group 1 = href,
    group 2 = inner markup) — two ``regexp_extract_all`` calls over the
    SAME pattern yield position-aligned arrays, so ``arrays_zip`` pairs
    them without a Python step. Inner markup strips nested tags and
    collapses whitespace in codegen; href resolution reuses the shared
    Arrow ``_resolve`` boundary. Image-only/empty anchors drop (no text
    signal); the per-page cap bounds explode fan-out exactly like
    ``extract_links``."""
    pairs = F.slice(
        F.arrays_zip(
            F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_RX), 1).alias("ref"),
            F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_RX), 2).alias("raw"),
        ),
        1,
        max_anchors_per_page,
    )
    bad = r"(?i)^(mailto|javascript|data|tel):"
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("_p.raw"), r"<[^>]*>", " "),
            r"[\t\n\x0B\f\r ]+",
            " ",
        )
    )
    return (
        pages.select(F.col(base_col).alias("_base"), F.explode(pairs).alias("_p"))
        .select("_base", F.col("_p.ref").alias("_ref"), text.alias("anchor"))
        .filter(
            (F.col("anchor") != "")
            & (F.trim("_ref") != "")
            & ~F.trim("_ref").startswith("#")
            & ~F.trim("_ref").rlike(bad)
        )
        .select(
            canonical_url("_base").alias("base"),
            canonical_url(_resolve("_base", "_ref")).alias("link"),
            "anchor",
        )
        .filter(F.col("link").isNotNull() & (F.col("link") != F.col("base")))
        .distinct()
    )


def anchor_text_summary(anchors: DataFrame) -> DataFrame:
    """(link, anchor, n_pages) — how many DISTINCT pages describe
    ``link`` with each anchor text: the aggregated training/retrieval
    signal (a target's most common anchor is its crowd-sourced title).
    One hash aggregate over the anchor rows; ``n_pages`` counts pages
    not occurrences, so a single page repeating its nav bar cannot
    dominate a label."""
    return (
        anchors.groupBy("link", "anchor")
        .agg(F.countDistinct("base").alias("n_pages"))
    )
