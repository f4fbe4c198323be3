"""Crawl politeness: distributed robots.txt parsing/matching (RFC
9309) and sitemap XML extraction — the admission-control front of the
crawl frontier.

At crawl scale the robots corpus is one small document per host
(millions of hosts, KBs each) while the frontier is billions of URLs,
so the shapes here are:

- **parse_robots**: pure-codegen line parse (posexplode → directive
  regex → group assignment via a running user-agent-block counter
  window, partitioned BY HOST so no global ordering is ever needed)
  producing a flat RULES table (host, agent, is_allow, path pattern,
  LIKE translation, pattern length, crawl_delay).  Linear, one
  host-keyed window.
- **robots_decisions**: frontier ⋈ rules on host, RFC 9309
  longest-match-wins (allow wins ties), ``*``/``$`` wildcards via a
  LIKE translation evaluated JVM-side, group selection per RFC
  (specific user-agent groups override ``*`` groups entirely).  One
  join keyed by host + one per-URL window over the few matching
  rules; URLs on hosts with no robots.txt (or no matching rule)
  default to allowed.
- **parse_sitemaps**: ``<urlset>`` / ``<sitemapindex>`` extraction
  with stdlib ElementTree in an Arrow-batched pandas UDF (sitemaps
  are machine-written XML up to 50 MB — a real parser, not regex;
  malformed bodies quarantine as empty, never crash), exploded to
  one row per loc.

The allow/deny semantics are differential-tested against stdlib
``urllib.robotparser`` on the wildcard-free plane (where robotparser
is authoritative) plus the RFC 9309 wildcard examples robotparser
does not implement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType
from pyspark.sql.window import Window

#: directives we materialize; anything else (Host:, Clean-param:, …)
#: is dropped line-wise
_RULE_DIRECTIVES = ("allow", "disallow")


def _host_of(url: Column) -> Column:
    # regex, not parse_url/try_parse_url: crawl URLs are dirty (raw %,
    # spaces) — java.net.URI rejects them, but robots matching must
    # still see their authority; the same extractor runs on rule URLs
    # and frontier URLs so the join key is consistent
    return F.nullif(
        F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        F.lit(""),
    )


def _path_query_of(url: Column) -> Column:
    """Match target per RFC 9309: path plus optional query, '/' when
    absent."""
    pq = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    pq = F.regexp_replace(pq, r"#.*$", "")
    return F.when(pq == "", F.lit("/")).otherwise(pq)


def _like_pattern() -> Column:
    """Translate the ``pat_src`` robots path pattern column to a SQL
    LIKE pattern: escape LIKE metacharacters, ``*`` → ``%``, a
    trailing ``$`` anchors the end (no trailing ``%``); ``$``
    elsewhere is literal."""
    anchored = F.col("pat_src").rlike(r"\$$")
    body = F.when(anchored, F.expr("substring(pat_src, 1, length(pat_src) - 1)")).otherwise(
        F.col("pat_src")
    )
    esc = F.regexp_replace(body, r"([\\%_])", r"\\$1")
    like = F.regexp_replace(esc, r"\*", "%")
    return F.when(anchored, like).otherwise(F.concat(like, F.lit("%")))


def parse_robots(
    robots: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Flatten robots.txt documents into a rules table:

    (host, agent, is_allow int, pattern, like_pattern, pattern_len,
    crawl_delay double|null)

    plus ``agent='*'`` group semantics preserved exactly: a rule row
    exists per (agent line, rule line) pair within its group —
    consecutive ``User-agent`` lines share the group that the
    following rules bind to (RFC 9309 §2.2.1).  Sitemap directives are
    host-global; fetch them with :func:`robots_sitemap_urls`."""
    host = _host_of(F.col(url_col)).alias("host")
    lines = robots.select(
        host, F.posexplode(F.split(F.col(body_col), "\r?\n")).alias("pos", "line")
    )
    clean = lines.select(
        "host",
        "pos",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    d = clean.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias("directive"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias("value"),
    ).filter(F.col("directive") != "")
    wpos = Window.partitionBy("host").orderBy("pos")
    # a User-agent line NOT preceded by another User-agent line opens a
    # new group; the running sum of group-openers is the group id
    opener = (
        (F.col("directive") == "user-agent")
        & (F.coalesce(F.lag("directive").over(wpos), F.lit("")) != "user-agent")
    ).cast("int")
    g = d.select(
        "host",
        "pos",
        "directive",
        "value",
        F.sum(opener).over(wpos).alias("gid"),
    )
    agents = (
        g.filter(F.col("directive") == "user-agent")
        .select("host", "gid", F.lower(F.col("value")).alias("agent"))
        .distinct()
    )
    delays = (
        g.filter(F.col("directive") == "crawl-delay")
        .groupBy("host", "gid")
        .agg(F.min(F.col("value").cast("double")).alias("crawl_delay"))
    )
    rules = (
        g.filter(F.col("directive").isin(*_RULE_DIRECTIVES))
        .filter(F.col("value") != "")  # empty Disallow: == no rule
        .select(
            "host",
            "gid",
            (F.col("directive") == "allow").cast("int").alias("is_allow"),
            F.col("value").alias("pattern"),
        )
    )
    bound = (
        agents.join(rules, ["host", "gid"], "left")
        .join(delays, ["host", "gid"], "left")
        .select(
            "host",
            "agent",
            "is_allow",
            "pattern",
            "crawl_delay",
            F.col("pattern").alias("pat_src"),
        )
    )
    return bound.select(
        "host",
        "agent",
        "is_allow",
        "pattern",
        F.when(F.col("pattern").isNotNull(), _like_pattern()).alias("like_pattern"),
        F.when(
            F.col("pattern").isNotNull(),
            F.length(F.regexp_replace("pattern", r"\$$", "")),
        ).alias("pattern_len"),
        "crawl_delay",
    )


def robots_decisions(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """Per-URL admission decision for ``agent``:

    (url, allowed int, crawl_delay double|null)

    RFC 9309: among the groups for the most specific matching
    user-agent (exact product token, else ``*``), the rule with the
    LONGEST pattern that matches the URL's path wins; allow wins
    length ties; no matching rule (or no robots.txt for the host)
    means allowed.  One host-keyed join + one window over the handful
    of candidate rules per URL."""
    a = agent.lower()
    r = rules.filter(F.col("agent").isin(a, "*"))
    exact_hosts = (
        r.filter(F.col("agent") == a).select("host").distinct()
        .withColumn("has_exact", F.lit(1))
    )
    r = (
        r.join(exact_hosts, "host", "left")
        .filter(
            (F.col("agent") == a)
            | (F.col("has_exact").isNull() & (F.col("agent") == "*"))
        )
    )
    # crawl delay is host-level for the selected agent (min across its
    # groups) — independent of which path rule wins
    delays = r.groupBy("host").agg(F.min("crawl_delay").alias("crawl_delay"))
    u = urls.select(
        F.col(url_col).alias("url"),
        _host_of(F.col(url_col)).alias("host"),
        _path_query_of(F.col(url_col)).alias("pq"),
    )
    cand = u.join(r.drop("crawl_delay"), "host", "left").withColumn(
        "matched",
        F.col("pattern").isNotNull()
        & F.expr("pq like like_pattern escape '\\\\'"),
    )
    win = Window.partitionBy("url").orderBy(
        F.col("matched").desc(),
        F.col("pattern_len").desc(),
        F.col("is_allow").desc(),
        F.col("pattern"),
    )
    return (
        cand.select(
            "url",
            "host",
            "matched",
            "is_allow",
            F.row_number().over(win).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .join(delays, "host", "left")
        .select(
            "url",
            F.when(F.col("matched"), F.col("is_allow"))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("allowed"),
            "crawl_delay",
        )
    )


def robots_sitemap_urls(
    robots: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(host, sitemap_url) — ``Sitemap:`` directives are host-global
    (outside any group)."""
    host = _host_of(F.col(url_col)).alias("host")
    lines = robots.select(
        host, F.explode(F.split(F.col(body_col), "\r?\n")).alias("line")
    )
    sm = lines.select(
        "host",
        F.trim(
            F.regexp_extract(
                F.regexp_replace("line", r"#.*$", ""), r"(?i)^sitemap\s*:(.*)$", 1
            )
        ).alias("sitemap_url"),
    )
    return sm.filter(F.col("sitemap_url") != "").distinct()


@F.pandas_udf(ArrayType(StringType()))
def _sitemap_locs(body):
    """All <loc> values of a <urlset> or <sitemapindex> document, in
    document order; malformed XML → empty (quarantine, never crash)."""
    import pandas as pd
    from xml.etree import ElementTree

    def locs(text):
        if text is None:
            return []
        try:
            root = ElementTree.fromstring(text)
        except ElementTree.ParseError:
            return []
        tag = root.tag.rsplit("}", 1)[-1]
        if tag not in ("urlset", "sitemapindex"):
            return []
        out = []
        for el in root.iter():
            if el.tag.rsplit("}", 1)[-1] == "loc" and el.text:
                out.append(el.text.strip())
        return out

    return pd.Series([locs(t) for t in body])


def parse_sitemaps(
    sitemaps: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(sitemap_url, kind, loc) — one row per extracted location;
    ``kind`` is 'index' (locs are further sitemaps to fetch) or
    'urlset' (locs are page URLs to enqueue).  Arrow-batched parse,
    linear in sitemap bytes."""
    kind = F.when(
        F.col(body_col).rlike(r"<\s*(\w+:)?sitemapindex[\s>]"), F.lit("index")
    ).otherwise(F.lit("urlset"))
    return (
        sitemaps.select(
            F.col(url_col).alias("sitemap_url"),
            kind.alias("kind"),
            F.explode(_sitemap_locs(F.col(body_col))).alias("loc"),
        )
    )
