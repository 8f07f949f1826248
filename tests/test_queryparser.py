"""Classic QueryParser syntax → query tree → search results."""

from __future__ import annotations

import pytest

from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_spark.search.queryparser import QueryParseError, parse_query


def occurs(q):
    assert isinstance(q, BooleanQuery)
    return [(c.occur, c.query) for c in q.clauses]


def test_bare_terms_are_should():
    q = parse_query("spark query")
    assert occurs(q) == [
        (Occur.SHOULD, TermQuery("spark")),
        (Occur.SHOULD, TermQuery("query")),
    ]


def test_single_term_unwraps():
    assert parse_query("Spark") == TermQuery("spark")


def test_and_promotes_both_to_must():
    q = parse_query("Abraham AND Lincoln")
    assert occurs(q) == [
        (Occur.MUST, TermQuery("abraham")),
        (Occur.MUST, TermQuery("lincoln")),
    ]


def test_reference_benchmark_queries_parse():
    # shapes from lucene/benchmark/conf/query-terms.txt & query-wildcards.txt
    for s in [
        "Abraham AND Lincoln",
        "doctor OR lawyer",
        '"exact phrase here"',
        '"sloppy phrase"~2',
        "presiden*",
        "pre?ident",
        "roosevelt~1",
        "+required -excluded optional",
        "(a1 OR b1) AND c1",
        "[apple TO orange]",
        "boosted^2.5 plain",
    ]:
        parse_query(s)  # must not raise


def test_plus_minus_not():
    q = parse_query("+hash -scan NOT merge join")
    occ = occurs(q)
    assert (Occur.MUST, TermQuery("hash")) in occ
    assert (Occur.MUST_NOT, TermQuery("scan")) in occ
    assert (Occur.MUST_NOT, TermQuery("merge")) in occ
    assert (Occur.SHOULD, TermQuery("join")) in occ


def test_phrase_and_slop():
    assert parse_query('"Hash Join"') == PhraseQuery(("hash", "join"), 0)
    assert parse_query('"hash join"~3') == PhraseQuery(("hash", "join"), 3)
    # stopwords analyzed out of phrase
    assert parse_query('"the hash"') == TermQuery("hash")


def test_wildcards_fuzzy_range_boost():
    assert parse_query("spar*") == PrefixQuery("spar")
    assert parse_query("sp?rk") == WildcardQuery("sp?rk")
    assert parse_query("quer~1") == FuzzyQuery("quer", 1)
    assert parse_query("quer~") == FuzzyQuery("quer", 2)
    assert parse_query("[query TO sort]") == TermRangeQuery("query", "sort")
    assert parse_query("spark^2.5") == BoostQuery(TermQuery("spark"), 2.5)


def test_grouping_and_field_prefix():
    q = parse_query("(hash OR sort) AND join")
    occ = occurs(q)
    assert occ[0][0] == Occur.MUST and isinstance(occ[0][1], BooleanQuery)
    assert occ[1] == (Occur.MUST, TermQuery("join"))
    # field: prefixes are accepted and stripped (single-field engine)
    assert parse_query("contents:spark") == TermQuery("spark")


def test_unbalanced_paren_raises():
    with pytest.raises(QueryParseError):
        parse_query("(a OR b")


def test_parsed_query_end_to_end(spark, documents):
    from lucene_spark.index import InvertedIndex
    from lucene_spark.search import IndexSearcher

    idx = InvertedIndex.build(
        documents, analyzer="simple", docs_per_segment=256, positions=True
    )
    s = IndexSearcher(idx)
    r1 = s.search(parse_query("hash AND join"), 10, "exhaustive").collect()
    assert len(r1) > 0
    r2 = s.search(parse_query('"hash join"'), 10, "exhaustive").collect()
    assert len(r2) > 0
    # phrase matches are a subset of the conjunction's matches
    assert {r["doc_id"] for r in r2} <= {
        r["doc_id"]
        for r in s.search(parse_query("hash AND join"), 10000, "exhaustive").collect()
    }
