"""Anchor-text extraction and aggregation (functions/weburl.py).

First-principles oracle: handcrafted HTML with known anchor elements —
the expected row set is written by hand, covering nested markup, relative
resolution, scheme filtering, canonicalization and the distinct-page
aggregation semantics.
"""

import pytest
from rustcheatersdatapipeline_spark.functions.weburl import (
    anchor_text_summary,
    extract_anchors,
)

HTML_A = """
<html><body>
  <a href="http://b.test/page">Good  Page</a>
  <a href="/rel/path">Relative <b>bold</b> link</a>
  <a href="mailto:x@y.z">mail me</a>
  <a href="#frag">same page</a>
  <a href="http://c.test/img"><img src="x.png"/></a>
  <a class="nav" href='http://b.test/page'>Good
  Page</a>
  <a href="HTTP://B.TEST:80/page?utm_source=t&q=1">tracked</a>
</body></html>
"""

HTML_B = '<a href="http://b.test/page">Good Page</a>'


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


@pytest.mark.slow
def test_extract_anchors_first_principles(spark):
    got = {
        (r["base"], r["link"], r["anchor"])
        for r in extract_anchors(_pages(spark, [("http://a.test/x", HTML_A)])).collect()
    }
    assert got == {
        # whitespace (incl. the newline) collapses; duplicate rows fold
        ("http://a.test/x", "http://b.test/page", "Good Page"),
        # nested tags strip, relative href resolves against the page
        ("http://a.test/x", "http://a.test/rel/path", "Relative bold link"),
        # host case + default port + tracking param canonicalize away
        ("http://a.test/x", "http://b.test/page?q=1", "tracked"),
        # mailto:, fragment-only and image-only (empty-text) anchors drop
    }


def test_anchor_text_summary_counts_distinct_pages(spark):
    anchors = extract_anchors(
        _pages(
            spark,
            [
                ("http://a.test/x", HTML_A),
                ("http://d.test/y", HTML_B),
            ],
        )
    )
    rows = {
        (r["link"], r["anchor"]): r["n_pages"]
        for r in anchor_text_summary(anchors).collect()
    }
    # two distinct pages call b.test/page "Good Page" — even though one
    # of them says it twice
    assert rows[("http://b.test/page", "Good Page")] == 2
    assert rows[("http://a.test/rel/path", "Relative bold link")] == 1


def test_anchor_fanout_bound(spark):
    html = "".join(
        f'<a href="http://t.test/{i}">text {i}</a>' for i in range(50)
    )
    got = extract_anchors(
        _pages(spark, [("http://a.test/", html)]), max_anchors_per_page=10
    ).collect()
    assert len(got) == 10


def test_extract_links_still_works_with_shared_resolver(spark):
    """The resolver refactor must not change extract_links semantics."""
    from rustcheatersdatapipeline_spark.functions.weburl import extract_links

    got = {
        (r["base"], r["link"])
        for r in extract_links(_pages(spark, [("http://a.test/x", HTML_A)])).collect()
    }
    assert ("http://a.test/x", "http://b.test/page") in got
    assert ("http://a.test/x", "http://a.test/rel/path") in got
    assert all(not l.startswith("mailto") for _, l in got)
