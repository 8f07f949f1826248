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
    host-level stats)."""
    return F.lower(F.parse_url(url_col, F.lit("HOST")))


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
