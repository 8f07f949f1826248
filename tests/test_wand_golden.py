"""WAND golden fixture (FIXTURES.md F2), mirroring the reference
`lucene/core/src/test/org/apache/lucene/search/TestWANDScorer.java:87-263`:

6 docs with keyword field values [A,B],[A],[],[A,B,C],[B],[B,C];
query SHOULD(ConstantScore(A)^2, ConstantScore(B)^1, ConstantScore(C)^3)
→ exact (docID, score): 0→3, 1→2, 3→6, 4→1, 5→4, tie-break docID asc;
plus minShouldMatch / FILTER / MUST_NOT variants (:264-728).
"""

import pandas as pd
import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    IndexSearcher,
    MatchNoDocsQuery,
    Occur,
    TermQuery,
    rewrite,
)

DOCS = ["A B", "A", "", "A B C", "B", "B C"]


@pytest.fixture(scope="module")
def searcher(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(6), "text": DOCS}))
    return IndexSearcher(InvertedIndex.build(df, analyzer="simple", docs_per_segment=4))


def _cs(term, boost):
    return BooleanClause(BoostQuery(ConstantScoreQuery(TermQuery(term)), boost), Occur.SHOULD)


GOLDEN_QUERY = BooleanQuery.of(_cs("A", 2.0), _cs("B", 1.0), _cs("C", 3.0))


def _hits(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("mode", ["exhaustive", "wand"])
def test_basics_golden(searcher, mode):
    got = _hits(searcher.search(GOLDEN_QUERY, k=10, mode=mode))
    # expected order: score desc, docID asc
    assert got == [(3, 6.0), (5, 4.0), (0, 3.0), (1, 2.0), (4, 1.0)]


@pytest.mark.parametrize("mode", ["exhaustive", "wand"])
def test_min_competitive_equivalent_topk(searcher, mode):
    # setMinCompetitiveScore(4) analog: top-2 only has docs 3 (6.0), 5 (4.0)
    got = _hits(searcher.search(GOLDEN_QUERY, k=2, mode=mode))
    assert got == [(3, 6.0), (5, 4.0)]


def test_min_should_match_2(searcher):
    q = BooleanQuery.of(_cs("A", 2.0), _cs("B", 1.0), _cs("C", 3.0), min_should_match=2)
    got = _hits(searcher.search(q, k=10, mode="exhaustive"))
    # docs matching >=2 terms: 0 (A,B)→3, 3 (A,B,C)→6, 5 (B,C)→4
    assert got == [(3, 6.0), (5, 4.0), (0, 3.0)]


def test_filter_clause(searcher):
    q = BooleanQuery.of(
        _cs("A", 2.0),
        _cs("B", 1.0),
        BooleanClause(TermQuery("C"), Occur.FILTER),
    )
    got = _hits(searcher.search(q, k=10))
    # only docs containing C: 3 (A+B → 3.0), 5 (B → 1.0); filter adds no score
    assert got == [(3, 3.0), (5, 1.0)]


def test_must_not_clause(searcher):
    q = BooleanQuery.of(
        _cs("A", 2.0),
        _cs("B", 1.0),
        BooleanClause(TermQuery("C"), Occur.MUST_NOT),
    )
    got = _hits(searcher.search(q, k=10))
    # docs without C: 0→3, 1→2, 4→1
    assert got == [(0, 3.0), (1, 2.0), (4, 1.0)]


def test_must_plus_should(searcher):
    q = BooleanQuery.of(
        BooleanClause(BoostQuery(ConstantScoreQuery(TermQuery("A")), 2.0), Occur.MUST),
        _cs("C", 3.0),
    )
    got = _hits(searcher.search(q, k=10))
    # must contain A: docs 0,1,3; C adds 3 on doc 3
    assert got == [(3, 5.0), (0, 2.0), (1, 2.0)]


def test_rewrite_must_and_must_not_same_query():
    q = BooleanQuery.of(
        BooleanClause(TermQuery("A"), Occur.MUST),
        BooleanClause(TermQuery("A"), Occur.MUST_NOT),
    )
    assert isinstance(rewrite(q), MatchNoDocsQuery)


def test_rewrite_single_clause_unwrap():
    q = BooleanQuery.of(BooleanClause(TermQuery("A"), Occur.SHOULD))
    assert rewrite(q) == TermQuery("A")
