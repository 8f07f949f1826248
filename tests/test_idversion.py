"""ID-version postings analog (sandbox/codecs/idversion/
IDVersionPostingsFormat.java:36): versioned PK map, seekExact(id,
minVersion) semantics, optimistic-concurrency update skipping."""

import pytest

from lucene_spark.index.idversion import (
    apply_updates,
    build_id_version,
    seek_exact,
)


@pytest.fixture(scope="module")
def cur(spark):
    rows = [
        ("a", 1, 5), ("a", 2, 9),   # id a: doc 2 wins at v9
        ("b", 3, 4),
        ("c", 4, 7), ("c", 5, 7),   # version tie -> higher doc wins
    ]
    df = spark.createDataFrame(rows, "id string, doc_id long, version long")
    return build_id_version(df).cache()


def test_build_latest_wins(cur):
    got = {r["id"]: (r["doc_id"], r["version"]) for r in cur.collect()}
    assert got == {"a": (2, 9), "b": (3, 4), "c": (5, 7)}


def test_seek_exact_min_version(cur):
    got = {r["id"]: r["found"] for r in seek_exact(cur, ["a", "b", "z"], 4).collect()}
    # a: v9 > 4 -> found; b: v4 > 4 is false; z absent
    assert got == {"a": True, "b": False, "z": False}
    got0 = {r["id"]: r["found"] for r in seek_exact(cur, ["b"], 0).collect()}
    assert got0 == {"b": True}


def test_apply_updates_optimistic_concurrency(spark, cur):
    ups = spark.createDataFrame(
        [
            ("a", 10, 8),   # stale: 8 < 9 -> rejected
            ("b", 11, 5),   # newer: 5 > 4 -> lands
            ("c", 12, 7),   # equal: NOT strictly newer -> rejected
            ("d", 13, 1),   # new id -> lands
        ],
        "id string, doc_id long, version long",
    )
    got = {
        r["id"]: (r["doc_id"], r["version"])
        for r in apply_updates(cur, ups).collect()
    }
    assert got == {
        "a": (2, 9),
        "b": (11, 5),
        "c": (5, 7),
        "d": (13, 1),
    }
