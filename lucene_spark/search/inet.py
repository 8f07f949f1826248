"""InetAddressPoint analog: IP range / CIDR-prefix / set queries.

Lucene's `core/src/java/org/apache/lucene/document/InetAddressPoint.java:41`
stores every address as a 16-byte IPv6-form point (IPv4 is embedded as
an IPv4-mapped address, :69) and offers `newExactQuery`,
`newPrefixQuery` (CIDR, rewritten to a range via the network's first/
last address, :121-140), `newRangeQuery`, and `newSetQuery`.

Spark re-expression: the sortable byte key becomes a fixed-width
lower-hex string (two hex chars per byte — lexicographic order ==
byte order, the same trick the repo's collation and md5 keys use), so
every query is a plain string-range predicate that pushes into the
parquet scan (min/max pruning works because hex order is value
order). Query constants are parsed driver-side with the stdlib
`ipaddress` module; no UDF, no shuffle — pure pushed filters.

At 100 TB: partition the table by a key prefix (the /16 is the
natural Iceberg partition transform) and CIDR queries prune to the
covered partitions exactly like Lucene's BKD tree visits only
covering cells.
"""

from __future__ import annotations

import ipaddress
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "ip_key",
    "ipv4_key_col",
    "inet_range_query",
    "inet_prefix_query",
    "inet_set_query",
    "inet_exact_query",
    "int128_key",
    "int128_key_col",
    "int128_range_query",
]


def ip_key(ip: str) -> str:
    """The 32-hex-char sortable key of one address (16 bytes, IPv4
    embedded as IPv4-mapped ::ffff:a.b.c.d exactly like
    `InetAddressPoint.encode`, :69)."""
    a = ipaddress.ip_address(ip)
    if isinstance(a, ipaddress.IPv4Address):
        a = ipaddress.IPv6Address(b"\x00" * 10 + b"\xff\xff" + a.packed)
    return a.packed.hex()


def ipv4_key_col(dotted: Column) -> Column:
    """Column form of :func:`ip_key` for dotted-quad IPv4 strings —
    codegen'd split + format_string, no UDF."""
    o = F.split(dotted, r"\.")
    return F.format_string(
        "00000000000000000000ffff%02x%02x%02x%02x",
        F.get(o, 0).cast("int"),
        F.get(o, 1).cast("int"),
        F.get(o, 2).cast("int"),
        F.get(o, 3).cast("int"),
    )


def inet_range_query(
    df: DataFrame, key_col: str, lo: str, hi: str
) -> DataFrame:
    """`InetAddressPoint.newRangeQuery` (:158): both bounds inclusive."""
    return df.filter(
        (F.col(key_col) >= F.lit(ip_key(lo))) & (F.col(key_col) <= F.lit(ip_key(hi)))
    )


def inet_prefix_query(df: DataFrame, key_col: str, cidr: str) -> DataFrame:
    """`InetAddressPoint.newPrefixQuery` (:121): a CIDR block, rewritten
    to the [network-address, broadcast-address] range exactly like the
    reference clears/sets the suffix bits."""
    net = ipaddress.ip_network(cidr, strict=True)
    return inet_range_query(
        df, key_col, str(net.network_address), str(net.broadcast_address)
    )


def inet_set_query(
    df: DataFrame, key_col: str, ips: Sequence[str]
) -> DataFrame:
    """`InetAddressPoint.newSetQuery` (:190): membership in an explicit
    address set (an IN filter — pushes down like TermInSet)."""
    return df.filter(F.col(key_col).isin([ip_key(i) for i in ips]))


def inet_exact_query(df: DataFrame, key_col: str, ip: str) -> DataFrame:
    """`InetAddressPoint.newExactQuery` (:104)."""
    return df.filter(F.col(key_col) == F.lit(ip_key(ip)))


def int128_key(v: int) -> str:
    """BigIntegerPoint (`sandbox/document/BigIntegerPoint.java:36`):
    a 128-bit signed integer as the 32-hex-char sortable key — the
    sign fold (+2^127) makes lexicographic hex order equal numeric
    order, exactly like the reference's sortableBytes encoding."""
    if not -(1 << 127) <= v < (1 << 127):
        raise ValueError("out of 128-bit signed range")
    return format(v + (1 << 127), "032x")


def int128_key_col(hi: Column, lo: Column) -> Column:
    """Column form of :func:`int128_key` for a value split into a
    signed high word and an unsigned-interpreted low word
    (v = hi·2^64 + (lo as unsigned)): flip the high word's sign bit
    (two's complement → unsigned order) and hex-format both words.
    Pure codegen (xor + format_string), no UDF; range predicates on
    the key push into the scan like any string column."""
    folded = hi.cast("long").bitwiseXOR(F.lit(-(2**63)))
    return F.format_string("%016x%016x", folded, lo.cast("long"))


def int128_range_query(
    df: DataFrame, key_col: str, lo: int, hi: int
) -> DataFrame:
    """`BigIntegerPoint.newRangeQuery` (:73): inclusive 128-bit range."""
    return df.filter(
        (F.col(key_col) >= F.lit(int128_key(lo)))
        & (F.col(key_col) <= F.lit(int128_key(hi)))
    )


def inet_range_relation(
    df: DataFrame,
    lo_key_col: str,
    hi_key_col: str,
    query_lo_ip: str,
    query_hi_ip: str,
    relation: str = "intersects",
) -> DataFrame:
    """InetAddressRange analog (`document/InetAddressRange.java:33`):
    documents store an ADDRESS RANGE [lo, hi]; queries relate a query
    range to it (intersects/within/contains/crosses with the
    reference's CROSSES = INTERSECTS && !WITHIN semantics).  The
    relation predicates reuse the generic RangeFieldQuery conditions
    over the fixed-width sortable hex keys, so every predicate is a
    plain string comparison that pushes to the scan.
    """
    from .rangefield import range_relation_cond

    return df.filter(
        range_relation_cond(
            F.col(lo_key_col),
            F.col(hi_key_col),
            ip_key(query_lo_ip),
            ip_key(query_hi_ip),
            relation,
        )
    )
