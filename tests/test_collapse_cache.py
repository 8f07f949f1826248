"""Field collapsing (best hit per group) + LRUQueryCache behavior."""

import duckdb
import pandas as pd
import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search import IndexSearcher, TermQuery, parse_query
from lucene_spark.search.collapse import collapse_topk
from lucene_spark.search.parity import oracle_collapse_sql
from lucene_spark.search.querycache import LRUQueryCache

_DOCS = [
    (0, "hash join a b", "en"),
    (1, "hash hash join", "en"),
    (2, "join c d e", "de"),
    (3, "hash join join", "de"),
    (4, "f g h i", "fr"),
    (5, "hash j k l", "fr"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_DOCS, ["doc_id", "text", "lang"]).cache()


@pytest.fixture(scope="module")
def index(corpus):
    return InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=4)


def test_collapse_matches_oracle(index, corpus):
    got = [
        (r["group"], r["doc_id"], r["score"])
        for r in collapse_topk(
            index, {"hash": 1.0, "join": 1.0}, corpus, "lang", k=5
        ).collect()
    ]
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(_DOCS, columns=["doc_id", "text", "lang"])
    )
    want = [
        (g, d, pytest.approx(s, abs=1e-4))
        for g, d, s in con.execute(
            oracle_collapse_sql({"hash": 1.0, "join": 1.0}, "lang", k=5)
        ).fetchall()
    ]
    assert got == want
    # one hit per group
    assert len({g for g, _, _ in got}) == len(got)


def test_query_cache_hit_and_eviction(index):
    cache = LRUQueryCache(IndexSearcher(index), max_entries=2)
    q1 = parse_query("hash AND join")
    a = cache.matching_docs(q1)
    b = cache.matching_docs(q1)
    assert a is b  # cache hit returns the SAME persisted frame
    assert (cache.hits, cache.misses) == (1, 1)
    assert a.storageLevel.useMemory

    # equivalent tree (different construction) rewrites to the same key
    q1b = parse_query("hash AND join")
    assert cache.matching_docs(q1b) is a

    cache.matching_docs(TermQuery("hash"))
    cache.matching_docs(TermQuery("join"))  # evicts q1 (LRU)
    assert len(cache._entries) == 2
    assert not a.storageLevel.useMemory  # evicted -> unpersisted
    assert {r["doc_id"] for r in cache.matching_docs(q1).collect()} == {0, 1, 3}


def test_query_cache_results_correct(index):
    cache = LRUQueryCache(IndexSearcher(index), max_entries=4)
    assert {r["doc_id"] for r in cache.matching_docs(TermQuery("hash")).collect()} == {
        0, 1, 3, 5,
    }
    cache.clear()
    assert len(cache._entries) == 0
