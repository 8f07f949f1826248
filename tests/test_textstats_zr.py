"""Deflate compression-ratio quality signal (pipeline/textstats.py).

MassiveText/Gopher-family curation heuristic: low ratio = templated /
repetitive machine text, near-1 = natural prose, >1 = high-entropy
noise (deflate overhead)."""

import pandas as pd

from lucene_spark.pipeline.textstats import compression_ratio


def test_ratio_separates_repetition_from_prose(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "spam spam spam " * 60,
                    "Compression ratios separate boilerplate from genuine "
                    "prose because deflate models the repeated structure.",
                    None,
                ],
            }
        )
    )
    rows = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert rows[0]["ratio"] < 0.1
    assert 0.6 < rows[1]["ratio"] <= 1.1
    assert rows[2]["raw_bytes"] == 0 and rows[2]["ratio"] == 0.0


def test_ratio_matches_local_zlib(spark):
    import zlib

    texts = ["alpha beta gamma delta", "aaaa" * 25]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    rows = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for i, t in enumerate(texts):
        b = t.encode()
        assert rows[i]["raw_bytes"] == len(b)
        assert rows[i]["compressed_bytes"] == len(zlib.compress(b, 6))


# ------------------------------------------------------ domain capping


def _urls_df(spark, n=140):
    rows = [
        (i, f"https://www.site{i % 4}.com/p/{i}") for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_domain_cap_exact(spark):
    from lucene_spark.pipeline.urls import domain_cap

    kept = domain_cap(_urls_df(spark), cap=10).collect()
    from collections import Counter

    by_dom = Counter(r["url"].split("/")[2] for r in kept)
    assert all(v == 10 for v in by_dom.values())
    assert len(by_dom) == 4


def test_domain_cap_blocklist(spark):
    from lucene_spark.pipeline.urls import domain_cap

    kept = domain_cap(
        _urls_df(spark), cap=10, blocklist=["site0.com"]
    ).collect()
    assert not any("site0.com" in r["url"] for r in kept)
    assert len(kept) == 30


def test_domain_cap_deterministic_across_partitioning(spark):
    from lucene_spark.pipeline.urls import domain_cap

    df = _urls_df(spark)
    a = {r["doc_id"] for r in domain_cap(df, cap=7).collect()}
    b = {r["doc_id"] for r in domain_cap(df.repartition(13), cap=7).collect()}
    assert a == b


def test_domain_cap_rate_variant(spark):
    from lucene_spark.pipeline.urls import domain_cap

    kept = domain_cap(_urls_df(spark, 400), cap=20, exact=False).collect()
    from collections import Counter

    by_dom = Counter(r["url"].split("/")[2] for r in kept)
    # expected-cap thinning: each domain (100 docs) keeps ~20
    assert all(5 <= v <= 40 for v in by_dom.values())
    # under-cap domains are untouched
    small = domain_cap(_urls_df(spark, 8), cap=20, exact=False).collect()
    assert len(small) == 8


def test_domain_cap_validates(spark):
    import pytest as _pytest

    from lucene_spark.pipeline.urls import domain_cap

    with _pytest.raises(ValueError):
        domain_cap(_urls_df(spark), cap=0)


def test_domain_cap_null_domain_not_blocklisted(spark):
    # unparseable url -> NULL domain; a blocklist must not silently
    # drop it (code-review regression)
    from lucene_spark.pipeline.urls import domain_cap

    df = spark.createDataFrame(
        [(1, "https://www.ok.com/x"), (2, "not a url")],
        "doc_id long, url string",
    )
    kept = {r["doc_id"] for r in domain_cap(df, cap=5, blocklist=["spam.com"]).collect()}
    assert kept == {1, 2}
