"""Unit pins for text.urls: every normalization rewrite on explicit
fixtures, byte-for-byte."""

from pyspark.sql import functions as F

from dislib_spark.text.urls import canonicalize_url, url_host

CASES = [
    # (input, canonical)
    (
        "HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&b=2&a=1#frag",
        "https://example.com/a/b?a=1&b=2",
    ),
    ("http://example.com:80/", "http://example.com"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com./x/", "https://example.com/x"),
    ("https://sub.example.com/p?ref=rss", "https://sub.example.com/p"),
    (
        "https://example.com/p?fbclid=1&gclid=2&msclkid=3&igshid=4",
        "https://example.com/p",
    ),
    # 'refx' is NOT a tracking param (the regex anchors on = or end)
    ("https://example.com/p?refx=1", "https://example.com/p?refx=1"),
    ("https://example.com", "https://example.com"),
    (
        "  https://example.com/Case/Sensitive/Path  ",
        "https://example.com/Case/Sensitive/Path",
    ),
    (
        "https://example.com/p?z=1&y=&x=2",
        "https://example.com/p?x=2&y=&z=1",
    ),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in CASES], "url string"
    ).select(
        "url", canonicalize_url(F.col("url")).alias("canon")
    )
    got = {r["url"]: r["canon"] for r in df.collect()}
    for u, want in CASES:
        assert got[u] == want, f"{u!r}: {got[u]!r} != {want!r}"


def test_url_host(spark):
    rows = [
        ("HTTPS://WWW.Example.COM:443/a", "example.com"),
        ("http://sub.Example.com./x", "sub.example.com"),
        ("https://example.com?q=1", "example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [
        r["h"]
        for r in df.select(url_host(F.col("url")).alias("h")).collect()
    ]
    assert got == [w for _, w in rows]


def test_canonical_is_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) — the dedup
    key must be a fixed point."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(
        "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r["c1"] == r["c2"]
