"""URL canonicalization + compression-ratio signal (functions/weburl.py).

The canonicalization oracle is Python's urllib (independent parser):
for every case the codegen expression must agree with a reference
normalization built on urlsplit. Compression ratios are checked against
direct zlib calls and the prose/spam/gibberish ordering."""

import zlib

import pytest
from urllib.parse import parse_qsl, urlsplit

from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.functions.weburl import (
    TRACKING_PARAMS,
    canonical_url,
    compression_ratio,
    dedup_by_url,
    quality_compression_flags,
)


def _oracle(url: str) -> str:
    s = urlsplit(url)
    host = s.netloc.lower()
    if s.scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    if s.scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = s.path or "/"
    params = [
        f"{k}={v}" if v != "" else k
        for k, v in parse_qsl(s.query, keep_blank_values=True)
        if k.lower() not in TRACKING_PARAMS
    ]
    q = "&".join(sorted(params))
    return f"{s.scheme.lower()}://{host}{path}" + (f"?{q}" if q else "")


CASES = [
    "HTTP://Example.COM/Path/Page",
    "http://example.com:80/x",
    "https://example.com:443/x",
    "https://example.com:8443/x",  # non-default port kept
    "http://a.test/p?b=2&a=1",
    "http://a.test/p?a=1&utm_source=tw&b=2&fbclid=xyz",
    "http://a.test/p#section-3",
    "http://a.test",
    "http://a.test/?utm_campaign=x",
    "http://a.test/CaseSensitive/Path?z=Z&y=Y#frag",
]


def test_canonical_matches_urllib_oracle(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [_oracle(u) for u in CASES]


def test_equivalent_urls_collapse(spark):
    pairs = [
        (1, "HTTP://A.Test:80/x?b=2&a=1&utm_source=t#f"),
        (2, "http://a.test/x?a=1&b=2"),
        (3, "http://a.test/x?a=1&b=3"),  # different resource
    ]
    df = spark.createDataFrame(pairs, "doc_id long, source string")
    out = {r["doc_id"] for r in dedup_by_url(df).collect()}
    assert out == {1, 3}  # min-id survivor for the pair, 3 untouched


def test_canonical_is_codegen_no_python(spark):
    df = spark.createDataFrame([("http://a.test/x",)], "url string")
    plan = df.select(canonical_url("url")).queryExecution if False else None
    s = df.select(canonical_url("url").alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in s and "ArrowEval" not in s


def test_compression_ratio_values_and_ordering(spark):
    prose = (
        "The quick brown fox jumps over the lazy dog while reading a "
        "surprisingly informative article about data pipelines and ducks. "
        "Later sections cover partitioning strategy, shuffle volume, and "
        "the usual trade between recall and candidate pressure in practice."
    )
    spam = "buy now " * 200
    rng = __import__("numpy").random.RandomState(0)
    gibberish = "".join(chr(c) for c in rng.randint(33, 127, 4000))
    df = spark.createDataFrame(
        [(1, prose), (2, spam), (3, gibberish), (4, None), (5, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_compression_flags(df).collect()}
    raw = prose.encode()
    assert out[1]["compression_ratio"] == pytest.approx(
        len(zlib.compress(raw, 6)) / len(raw)
    )
    assert out[2]["compression_ratio"] < 0.1 and not out[2]["keep_compression"]
    assert out[3]["compression_ratio"] > out[1]["compression_ratio"]
    assert out[4]["compression_ratio"] is None and out[5]["compression_ratio"] is None
    assert out[1]["keep_compression"]


def test_canonical_property_vs_urllib(spark):
    """Hypothesis-style component sweep (deterministic seed): URLs
    assembled from random scheme/host-case/port/path/params/fragment
    combinations must all agree with the urllib oracle — including the
    empty-value edge ("a=" ≡ "a") and tracking params in any case."""
    import random

    rng = random.Random(42)
    urls = []
    for _ in range(120):
        scheme = rng.choice(["http", "https", "HTTP", "HttpS"])
        host = rng.choice(["A.Test", "sub.Example.ORG", "x.io"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/A/b", "/p%20q"])
        n = rng.randint(0, 4)
        parts = []
        for _ in range(n):
            k = rng.choice(["a", "B", "utm_source", "Gclid", "z"])
            v = rng.choice(["", "1", "Xy"])
            parts.append(f"{k}={v}" if rng.random() < 0.8 else k)
        q = ("?" + "&".join(parts)) if parts else ""
        frag = rng.choice(["", "#f", "#sec-2"])
        urls.append(f"{scheme}://{host}{port}{path}{q}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    for u, g in zip(urls, got):
        assert g == _oracle(u), (u, g, _oracle(u))
