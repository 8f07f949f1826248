"""IndexSearcher.count fast paths and explain() score fidelity."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex, delete_by_ids
from lucene_spark.search import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    IndexSearcher,
    MatchAllDocsQuery,
    Occur,
    TermQuery,
    parse_query,
)

_DOCS = [
    (0, "hash join a b"),
    (1, "hash hash join join join"),
    (2, "join c d"),
    (3, "hash e f g h i j k l m n o p"),
    (4, "q r s t"),
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    return InvertedIndex.build(docs, analyzer="simple", docs_per_segment=2)


def test_count_fast_paths(index):
    s = IndexSearcher(index)
    assert s.count(MatchAllDocsQuery()) == 5
    assert s.count(TermQuery("hash")) == 3  # docFreq, no decode
    assert s.count(TermQuery("zzz")) == 0
    assert s.count(BoostQuery(TermQuery("join"), 3.0)) == 3


def test_count_boolean(index):
    s = IndexSearcher(index)
    assert s.count(parse_query("hash AND join")) == 2
    assert s.count(parse_query("hash OR join")) == 4
    assert s.count(parse_query("hash -join")) == 1


def test_count_with_deletes(index):
    deleted = delete_by_ids(index, [0])
    try:
        s = IndexSearcher(deleted)
        assert s.count(TermQuery("hash")) == 2  # falls off the docFreq path
        assert s.count(MatchAllDocsQuery()) == 4
    finally:
        pass


def test_explain_matches_search_score(index):
    s = IndexSearcher(index)
    q = BooleanQuery.of(
        BooleanClause(BoostQuery(TermQuery("hash"), 2.0), Occur.SHOULD),
        BooleanClause(TermQuery("join"), Occur.SHOULD),
    )
    scores = {
        r["doc_id"]: r["score"] for r in s.search(q, k=10, mode="exhaustive").collect()
    }
    for doc_id, want in scores.items():
        ex = s.explain(q, doc_id)
        assert ex["match"] is True
        assert ex["value"] == pytest.approx(want, rel=1e-6)
        assert ex["description"] == "sum of:"
        # leaf structure: boost / idf / tf details per matching term
        for leaf in ex["details"]:
            names = [d["description"].split(",")[0] for d in leaf["details"]]
            assert names == ["boost", "idf", "tf"]


def test_explain_non_matching_doc(index):
    s = IndexSearcher(index)
    ex = s.explain(TermQuery("hash"), 4)
    assert ex["match"] is False and ex["value"] == 0.0


def test_explain_term_leaf_components(index):
    s = IndexSearcher(index)
    ex = s.explain(TermQuery("hash"), 1)
    [leaf] = ex["details"]
    boost, idf, tf = (d["value"] for d in leaf["details"])
    assert leaf["value"] == pytest.approx(boost * idf * tf, rel=1e-6)
    assert "freq=2" in leaf["details"][2]["description"]
