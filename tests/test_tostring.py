"""Query.toString parity (search/tostring.py) vs the reference's own
toString formats — TestBooleanQuery.java:1339 golden included."""

from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_spark.search.tostring import query_to_string as ts


def test_boolean_reference_golden():
    # TestBooleanQuery.java:1332-1339 (field matches default → bare)
    bq = BooleanQuery.of(
        BooleanClause(TermQuery("a"), Occur.SHOULD),
        BooleanClause(TermQuery("b"), Occur.MUST),
        BooleanClause(TermQuery("c"), Occur.MUST_NOT),
        BooleanClause(TermQuery("d"), Occur.FILTER),
    )
    assert ts(bq) == "a +b -c #d"


def test_field_prefix_when_default_differs():
    assert ts(TermQuery("apple")) == "apple"
    assert ts(TermQuery("apple"), field="") == "text:apple"


def test_nested_boolean_parens_and_msm():
    inner = BooleanQuery.of(
        BooleanClause(TermQuery("x"), Occur.SHOULD),
        BooleanClause(TermQuery("y"), Occur.SHOULD),
    )
    outer = BooleanQuery.of(
        BooleanClause(TermQuery("a"), Occur.MUST),
        BooleanClause(inner, Occur.SHOULD),
    )
    assert ts(outer) == "+a (x y)"
    msm = BooleanQuery.of(
        BooleanClause(TermQuery("a"), Occur.SHOULD),
        BooleanClause(TermQuery("b"), Occur.SHOULD),
        min_should_match=1,
    )
    assert ts(msm) == "(a b)~1"


def test_dismax_format():
    q = DisjunctionMaxQuery((TermQuery("a"), TermQuery("b")))
    assert ts(q) == "(a | b)"
    q2 = DisjunctionMaxQuery((TermQuery("a"), TermQuery("b")), tie_breaker=0.5)
    assert ts(q2) == "(a | b)~0.5"


def test_boost_and_constant_score():
    assert ts(BoostQuery(TermQuery("a"), 2.0)) == "(a)^2.0"
    assert ts(BoostQuery(TermQuery("a"), 2)) == "(a)^2.0"  # Java float print
    assert ts(ConstantScoreQuery(TermQuery("a"))) == "ConstantScore(a)"


def test_multi_term_formats():
    assert ts(PrefixQuery("pre")) == "pre*"
    assert ts(WildcardQuery("w?ld*")) == "w?ld*"
    assert ts(RegexpQuery("ab[cd]")) == "/ab[cd]/"
    assert ts(FuzzyQuery("term", max_edits=1)) == "term~1"
    assert ts(TermInSetQuery(("a", "b", "c"))) == "text:(a b c)"


def test_range_formats():
    assert ts(TermRangeQuery("a", "b")) == "[a TO b]"
    assert ts(TermRangeQuery("a", "b", False, False)) == "{a TO b}"
    assert ts(TermRangeQuery(None, "b")) == "[* TO b]"
    assert ts(TermRangeQuery("*", None)) == "[\\* TO *]"  # escaped-star quirk


def test_phrase_and_match_queries():
    assert ts(PhraseQuery(("a", "b"))) == '"a b"'
    assert ts(PhraseQuery(("a", "b"), slop=2)) == '"a b"~2'
    assert ts(MatchAllDocsQuery()) == "*:*"
    assert ts(MatchNoDocsQuery("empty")) == 'MatchNoDocsQuery("empty")'
