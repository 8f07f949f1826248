"""InetAddressPoint analog semantics (document/InetAddressPoint.java:41):
IPv4-mapped key encoding, CIDR rewrite to [network, broadcast], range
inclusivity, set/exact membership, IPv6 ordering."""

from lucene_spark.search.inet import (
    inet_exact_query,
    inet_prefix_query,
    inet_range_query,
    inet_set_query,
    ip_key,
    ipv4_key_col,
)
from pyspark.sql import functions as F


def test_ip_key_matches_reference_encoding():
    # IPv4 embeds as ::ffff:a.b.c.d (InetAddressPoint.encode:69)
    assert ip_key("1.2.3.4") == "00000000000000000000ffff01020304"
    assert ip_key("::1") == "0" * 31 + "1"
    # key order == address order across the v4 space
    assert ip_key("9.255.255.255") < ip_key("10.0.0.0") < ip_key("10.0.0.1")


def test_ipv4_key_col_matches_python(spark):
    df = spark.createDataFrame(
        [("1.2.3.4",), ("10.200.49.249",), ("255.255.255.255",)], "ip string"
    )
    rows = df.select("ip", ipv4_key_col(F.col("ip")).alias("k")).collect()
    for r in rows:
        assert r.k == ip_key(r.ip)


def test_prefix_and_range_queries(spark):
    df = spark.createDataFrame(
        [(i, ip) for i, ip in enumerate(
            ["10.63.255.255", "10.64.0.0", "10.100.1.2", "10.127.255.255",
             "10.128.0.0", "192.168.1.1"]
        )],
        "i bigint, ip string",
    ).select("i", ipv4_key_col(F.col("ip")).alias("k"))
    # /10 block = [10.64.0.0, 10.127.255.255] (newPrefixQuery:121)
    got = sorted(r.i for r in inet_prefix_query(df, "k", "10.64.0.0/10").collect())
    assert got == [1, 2, 3]
    got = sorted(
        r.i for r in inet_range_query(df, "k", "10.64.0.0", "10.128.0.0").collect()
    )
    assert got == [1, 2, 3, 4]  # both bounds inclusive (newRangeQuery:158)
    assert [r.i for r in inet_set_query(df, "k", ["192.168.1.1"]).collect()] == [5]
    assert [r.i for r in inet_exact_query(df, "k", "10.128.0.0").collect()] == [4]


def test_int128_key_order_and_column_parity(spark):
    # BigIntegerPoint.java:36 — sign fold gives numeric order; the
    # column form agrees with the Python encoder across signs
    from lucene_spark.search.inet import (
        int128_key,
        int128_key_col,
        int128_range_query,
    )

    assert int128_key(-1) < int128_key(0) < int128_key(1)
    assert int128_key(-(1 << 100)) < int128_key(-5) < int128_key(1 << 100)
    df = spark.createDataFrame(
        [(-3, 7), (0, 0), (5, 123), (-1, (1 << 63) - 1)],
        "hi bigint, lo bigint",
    ).select("hi", "lo", int128_key_col(F.col("hi"), F.col("lo")).alias("k"))
    for r in df.collect():
        v = (r.hi << 64) | (r.lo & ((1 << 64) - 1))
        assert r.k == int128_key(v)
    got = sorted(
        (r.hi, r.lo)
        for r in int128_range_query(df, "k", (-1 << 64), (5 << 64)).collect()
    )
    assert got == [(-1, (1 << 63) - 1), (0, 0)]


# ------------------------------------------------- InetAddressRange


def test_inet_range_relations(spark):
    from pyspark.sql import functions as F

    from lucene_spark.search.inet import inet_range_relation, ip_key

    rows = [
        (0, ip_key("10.10.0.0"), ip_key("10.20.0.0")),   # within query
        (1, ip_key("10.0.0.0"), ip_key("10.90.0.0")),    # contains query
        (2, ip_key("10.25.0.0"), ip_key("10.40.0.0")),   # crosses high edge
        (3, ip_key("10.50.0.0"), ip_key("10.60.0.0")),   # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, lo string, hi string")
    q = ("10.5.0.0", "10.30.0.0")

    def ids(rel):
        return sorted(
            r["doc_id"]
            for r in inet_range_relation(df, "lo", "hi", *q, relation=rel).collect()
        )

    assert ids("intersects") == [0, 1, 2]
    assert ids("within") == [0]
    assert ids("contains") == [1]
    # CROSSES = INTERSECTS && !WITHIN (contains still crosses)
    assert ids("crosses") == [1, 2]
