"""URL canonicalization and host grouping for web corpora.

A Common-Crawl-style pipeline keys many operations on the URL: exact
re-crawl dedup wants a canonical form (the same page is fetched as
`HTTP://Example.com:80/a?b=2&a=1#frag` and `http://example.com/a?a=1&b=2`),
politeness/sharding group by host, and mixing weights often key on the
registered domain. All column-level, all JVM (`parse_url` + regexp) —
no Python in the path.

Canonicalization applies the standard normalizations (RFC 3986 §6 +
the usual crawler conventions):

- scheme and host lowercased;
- default ports stripped (``:80`` http, ``:443`` https);
- fragment removed;
- query parameters sorted by name (byte order), empty query dropped;
- duplicate slashes in the path collapsed, trailing slash trimmed
  (except the root path).

:func:`registered_domain` keeps the last two host labels — a
documented approximation: the real notion needs the public-suffix
list (e.g. ``co.uk``), which isn't bundled; pass ``extra_suffixes``
for the two-label suffixes your corpus needs.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, functions as F

__all__ = ["canonicalize_url", "url_host", "registered_domain"]


def url_host(url_col: Column) -> Column:
    """Lowercased host of the URL (grouping key for politeness and
    host-level stats); NULL — not an exception — for unparseable
    input (web-crawl url columns always contain junk)."""
    return F.lower(F.try_parse_url(url_col, F.lit("HOST")))


def canonicalize_url(url_col: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module doc)."""
    scheme = F.lower(F.regexp_extract(url_col, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    host = url_host(url_col)
    port = F.regexp_extract(url_col, r"^[^:]+://[^/@]*?:(\d+)(?:[/?#]|$)", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.parse_url(url_col, F.lit("PATH"))
    # collapse duplicate slashes, trim trailing slash (keep root "/")
    path = F.regexp_replace(F.coalesce(path, F.lit("")), r"/{2,}", "/")
    path = F.when(
        (F.length(path) > 1), F.regexp_replace(path, r"/$", "")
    ).otherwise(path)
    query = F.parse_url(url_col, F.lit("QUERY"))
    sorted_query = F.array_join(
        F.array_sort(F.split(F.coalesce(query, F.lit("")), "&")), "&"
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(sorted_query != "", F.concat(F.lit("?"), sorted_query)).otherwise(
            F.lit("")
        ),
    )


def registered_domain(
    url_col: Column, extra_suffixes: Iterable[str] = ()
) -> Column:
    """Last-two-labels domain (``a.b.example.com`` → ``example.com``),
    with three labels kept for hosts under the given two-label
    suffixes (e.g. ``extra_suffixes=["co.uk"]`` →
    ``shop.co.uk`` stays ``shop.co.uk``)."""
    host = url_host(url_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    two = F.when(n >= 2, F.concat_ws(".", F.get(parts, n - 2), F.get(parts, n - 1))).otherwise(host)
    out = two
    for suf in extra_suffixes:
        out = F.when(
            (two == suf) & (n >= 3),
            F.concat_ws(".", F.get(parts, n - 3), two),
        ).otherwise(out)
    return out


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    cap: int = 100,
    blocklist: Iterable[str] = (),
    seed: int = 0,
    exact: bool = True,
) -> DataFrame:
    """Per-domain document cap + domain blocklist — the CommonCrawl
    curation step that stops mega-domains dominating a training mix
    (C4 and successors cap or downweight per-host contributions).

    Deterministic by construction: which docs survive depends only on
    (url, seed), never on partitioning — the keep-order within a
    domain is the md5 bucket of the url (same machinery as
    :func:`lucene_spark.pipeline.sampling.hash_sample`, verbatim
    SQL-expressible for the oracle).

    - ``exact=True``: row_number over (domain, bucket, url) keeps
      exactly ``cap`` docs per domain.  The window sorts each domain's
      rows; fine to ~10^7 docs/domain.  At true mega-domain skew use
    - ``exact=False``: expected-cap thinning — per-domain counts (one
      partial-agg'd groupBy, broadcast back) set a keep-rate
      ``cap/count`` applied as a bucket threshold: no window, no
      per-domain sort, survives any skew; survivor count is cap in
      expectation, not exactly.

    Blocklisted registered domains are dropped either way.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from lucene_spark.pipeline.sampling import _BUCKETS, _bucket

    dom = registered_domain(F.col(url_col))
    d = df.withColumn("_dom", dom)
    if blocklist:
        # NULL-safe: an unparseable url has a NULL domain — it is NOT
        # blocklisted (isin on NULL yields NULL, which a bare NOT
        # filter would silently drop)
        d = d.filter(
            F.col("_dom").isNull() | ~F.col("_dom").isin(list(blocklist))
        )
    bucket = _bucket(F.col(url_col), seed)
    if exact:
        from pyspark.sql import Window

        w = Window.partitionBy("_dom").orderBy(bucket.asc(), F.col(url_col).asc())
        return (
            d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn", "_dom")
        )
    # plain equi-join, not broadcast: the domain-count frame is tiny
    # relative to the corpus but can still exceed broadcast budgets at
    # web scale (~10^8 domains); AQE skew-join splits the mega-domain
    # partitions on the corpus side
    counts = d.groupBy("_dom").agg(F.count(F.lit(1)).alias("_n"))
    return (
        d.join(counts, "_dom")
        .filter(bucket < F.least(F.lit(_BUCKETS), (F.lit(cap * _BUCKETS) / F.col("_n")).cast("long")))
        .drop("_n", "_dom")
    )
