"""URL canonicalization goldens + idempotence + domain grouping."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.urls import canonicalize_url, registered_domain, url_host

_CASES = [
    # (input, canonical)
    ("HTTP://Example.COM:80/a/b?b=2&a=1#frag", "http://example.com/a/b?a=1&b=2"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("http://example.com//a//b/", "http://example.com/a/b"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://Sub.Host.org/path?z=1", "https://sub.host.org/path?z=1"),
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com/#only-frag", "http://example.com/"),
]


def _map(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["u"]).select(
        col_fn(F.col("u")).alias("v")
    )
    return [r["v"] for r in df.collect()]


def test_canonicalize_goldens(spark):
    got = _map(spark, canonicalize_url, [c[0] for c in _CASES])
    assert got == [c[1] for c in _CASES]


def test_canonicalize_idempotent(spark):
    once = _map(spark, canonicalize_url, [c[0] for c in _CASES])
    twice = _map(spark, canonicalize_url, once)
    assert twice == once


def test_canonical_dedup_groups(spark):
    # the same page under three spellings collapses to one key
    urls = [
        "HTTP://Example.com:80/a?b=2&a=1",
        "http://example.com/a?a=1&b=2",
        "http://example.com//a?b=2&a=1#x",
        "http://example.com/other",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["u"]).select(
        canonicalize_url(F.col("u")).alias("c")
    )
    counts = {r["c"]: r["cnt"] for r in df.groupBy("c").agg(F.count("*").alias("cnt")).collect()}
    assert counts["http://example.com/a?a=1&b=2"] == 3
    assert counts["http://example.com/other"] == 1


def test_url_host_and_domain(spark):
    hosts = _map(spark, url_host, ["https://A.B.Example.COM/x", "http://localhost/"])
    assert hosts == ["a.b.example.com", "localhost"]
    doms = _map(
        spark,
        lambda c: registered_domain(c),
        ["https://a.b.example.com/x", "http://example.com/", "http://localhost/"],
    )
    assert doms == ["example.com", "example.com", "localhost"]
    # public-suffix override keeps three labels
    doms = _map(
        spark,
        lambda c: registered_domain(c, extra_suffixes=["co.uk"]),
        ["https://www.shop.co.uk/x", "https://news.example.com/"],
    )
    assert doms == ["shop.co.uk", "example.com"]
