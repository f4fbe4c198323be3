"""Crawl politeness (functions/robots.py): RFC 9309 robots.txt
parsing + matching differentially tested against stdlib
urllib.robotparser on the wildcard-free plane, the RFC wildcard
examples robotparser does not implement, group semantics, and sitemap
XML extraction."""

import urllib.robotparser

import pytest
from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.functions.robots import (
    parse_robots,
    parse_sitemaps,
    robots_decisions,
    robots_sitemap_urls,
)


def _robots_df(spark, body, host="a.test"):
    return spark.createDataFrame(
        [(f"https://{host}/robots.txt", body)], "url string, body string"
    )


def _decide(spark, body, paths, agent="testbot", host="a.test"):
    rules = parse_robots(_robots_df(spark, body, host))
    urls = spark.createDataFrame(
        [(f"https://{host}{p}",) for p in paths], "url string"
    )
    out = robots_decisions(urls, rules, agent)
    return {
        r["url"].replace(f"https://{host}", ""): (r["allowed"], r["crawl_delay"])
        for r in out.collect()
    }


_PATHS = [
    "/",
    "/index.html",
    "/private/",
    "/private/x.html",
    "/privateer",
    "/public/doc.html",
    "/tmp/a/b",
    "/a.php",
    "/a.php?q=1",
    "/dir/sub/file.pdf",
]


@pytest.mark.parametrize(
    "body",
    [
        # NOTE: stdlib robotparser is FIRST-match-wins (file order);
        # RFC 9309 is LONGEST-match-wins. These bodies are chosen so
        # both semantics agree (no overlapping allow/disallow pairs
        # where the orders diverge); the divergent precedence cases
        # are asserted against RFC expectations in
        # test_longest_match_wins_and_allow_tie / test_rfc_wildcard_examples.
        "User-agent: *\nDisallow: /",
        "User-agent: *\nDisallow:",
        "User-agent: *\nDisallow: /private/\nDisallow: /tmp/",
        "User-agent: testbot\nDisallow: /tmp/\n\nUser-agent: *\nDisallow: /",
        "User-agent: otherbot\nDisallow: /\n\nUser-agent: *\nDisallow: /private/",
        "# nothing but comments\n",
        "User-agent: *\nAllow: /public/\nDisallow: /",
    ],
)
def test_wildcard_free_differential_vs_robotparser(spark, body):
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    got = _decide(spark, body, _PATHS)
    for p in _PATHS:
        exp = 1 if rp.can_fetch("testbot", f"https://a.test{p}") else 0
        assert got[p][0] == exp, (p, body)


def test_rfc_wildcard_examples(spark):
    """RFC 9309 / Google documented wildcard semantics that stdlib
    robotparser does not implement."""
    body = (
        "User-agent: *\n"
        "Disallow: /*.php\n"
        "Allow: /index.php$\n"
        "Disallow: /fish*.html\n"
    )
    got = _decide(
        spark,
        body,
        [
            "/a.php",
            "/dir/b.php",
            "/a.php5",  # /*.php matches the prefix .php anywhere
            "/index.php",  # exact-anchor allow beats /*.php (longer)
            "/index.php?x=1",  # $ anchor → the allow no longer matches
            "/fishheads.html",
            "/fish.html",
            "/fish/x.html",  # no .html after fish prefix chain? pattern fish*.html matches
            "/plain.html",
        ],
    )
    assert got["/a.php"][0] == 0
    assert got["/dir/b.php"][0] == 0
    assert got["/a.php5"][0] == 0  # prefix match: .php then anything
    assert got["/index.php"][0] == 1
    assert got["/index.php?x=1"][0] == 0
    assert got["/fishheads.html"][0] == 0
    assert got["/fish.html"][0] == 0
    assert got["/fish/x.html"][0] == 0
    assert got["/plain.html"][0] == 1


def test_longest_match_wins_and_allow_tie(spark):
    body = "User-agent: *\nAllow: /page\nDisallow: /page/sub\n"
    got = _decide(spark, body, ["/page", "/page/sub/deep"])
    assert got["/page"][0] == 1
    assert got["/page/sub/deep"][0] == 0  # longer disallow wins
    # equal length: allow wins the tie
    body2 = "User-agent: *\nAllow: /abc\nDisallow: /abc\n"
    assert _decide(spark, body2, ["/abcdef"])["/abcdef"][0] == 1
    # RFC precedence where stdlib robotparser (first-match) diverges:
    body3 = "User-agent: *\nDisallow: /private/\nAllow: /private/x.html\n"
    got3 = _decide(spark, body3, ["/private/x.html", "/private/y.html"])
    assert got3["/private/x.html"][0] == 1  # longer allow wins
    assert got3["/private/y.html"][0] == 0
    body4 = "User-agent: *\nDisallow: /a.php\nAllow: /a.php?q=1\n"
    got4 = _decide(spark, body4, ["/a.php", "/a.php?q=1"])
    assert got4["/a.php"][0] == 0
    assert got4["/a.php?q=1"][0] == 1


def test_group_semantics_and_crawl_delay(spark):
    body = (
        "User-agent: alpha\n"
        "User-agent: testbot\n"
        "Crawl-delay: 2.5\n"
        "Disallow: /only-bots/\n"
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 10\n"
        "Disallow: /\n"
    )
    got = _decide(spark, body, ["/only-bots/x", "/open"])
    # specific group applies; the * group's Disallow: / must NOT
    assert got["/only-bots/x"] == (0, 2.5)
    assert got["/open"] == (1, 2.5)
    # an agent with no specific group falls back to *
    got2 = _decide(spark, body, ["/open"], agent="stranger")
    assert got2["/open"] == (0, 10.0)


def test_no_robots_defaults_to_allowed(spark):
    rules = parse_robots(_robots_df(spark, "User-agent: *\nDisallow: /x"))
    urls = spark.createDataFrame(
        [("https://other.test/anything",)], "url string"
    )
    out = robots_decisions(urls, rules, "testbot").collect()
    assert out[0]["allowed"] == 1 and out[0]["crawl_delay"] is None


def test_case_insensitive_directives_and_crlf(spark):
    body = "USER-AGENT: *\r\nDISALLOW: /Priv/\r\nCrawl-Delay: 1\r\n"
    got = _decide(spark, body, ["/Priv/x", "/priv/x"])
    assert got["/Priv/x"] == (0, 1.0)
    assert got["/priv/x"][0] == 1  # path matching stays case-sensitive


def test_like_metacharacters_in_patterns_are_literal(spark):
    body = "User-agent: *\nDisallow: /100%_done/\n"
    got = _decide(spark, body, ["/100%_done/x", "/100Xdone/y", "/100%Adone/"])
    assert got["/100%_done/x"][0] == 0
    assert got["/100Xdone/y"][0] == 1
    assert got["/100%Adone/"][0] == 1


def test_sitemap_directive_extraction(spark):
    body = (
        "Sitemap: https://a.test/sitemap.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "sitemap: https://a.test/sitemap2.xml # trailing comment\n"
    )
    got = {
        r["sitemap_url"]
        for r in robots_sitemap_urls(_robots_df(spark, body)).collect()
    }
    assert got == {"https://a.test/sitemap.xml", "https://a.test/sitemap2.xml"}


_URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://a.test/p1</loc><lastmod>2024-01-01</lastmod></url>"
    "<url><loc> https://a.test/p2 </loc></url>"
    "</urlset>"
)
_INDEX = (
    '<?xml version="1.0"?>'
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc>https://a.test/s1.xml</loc></sitemap>"
    "<sitemap><loc>https://a.test/s2.xml</loc></sitemap>"
    "</sitemapindex>"
)


def test_parse_sitemaps_urlset_index_and_quarantine(spark):
    df = spark.createDataFrame(
        [
            ("https://a.test/sitemap.xml", _URLSET),
            ("https://a.test/index.xml", _INDEX),
            ("https://a.test/broken.xml", "<urlset><url><loc>x</loc>"),
            ("https://a.test/not-a-sitemap.xml", "<html><body>hi</body></html>"),
        ],
        "url string, body string",
    )
    rows = parse_sitemaps(df).collect()
    got = {}
    for r in rows:
        got.setdefault((r["sitemap_url"], r["kind"]), []).append(r["loc"])
    assert got == {
        ("https://a.test/sitemap.xml", "urlset"): [
            "https://a.test/p1",
            "https://a.test/p2",
        ],
        ("https://a.test/index.xml", "index"): [
            "https://a.test/s1.xml",
            "https://a.test/s2.xml",
        ],
    }
