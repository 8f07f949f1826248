"""Flexible (StandardQueryParser) dialect: differential vs classic on
the shared syntax subset, plus the flexible-only surface — config
handlers (default operator, phrase slop, fuzzy edits, leading
wildcard) and syntax extras (regexp, exclusive/mixed ranges).

Reference: `queryparser/flexible/standard/StandardQueryParser.java:92`,
occur resolution per `GroupQueryNodeProcessor`.
"""

import pytest

from lucene_spark.search import StandardQueryParser, parse_query
from lucene_spark.search.query import (
    BooleanQuery,
    FuzzyQuery,
    Occur,
    PhraseQuery,
    RegexpQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_spark.search.queryparser import QueryParseError

# the shared-syntax subset: flexible documents itself as
# classic-compatible here, so the trees must be identical
SHARED = [
    "spark AND query",
    "hash OR join OR merge",
    "+table -scan sort",
    '"hash join"',
    '"hash join"~2',
    "quer~1",
    "quer~",
    "s*",
    "wi?d*",
    "[merge TO sort]",
    "(hash OR sort) AND join^2",
    "term^2.5",
    "field:ignored rest",
    "hash-join",
    "a the of",  # all stopwords -> MatchNoDocs
]


@pytest.mark.parametrize("s", SHARED)
def test_differential_vs_classic(s):
    assert StandardQueryParser().parse(s) == parse_query(s)


def _occurs(q):
    return [(c.query, c.occur) for c in q.clauses]


def test_default_operator_and():
    p = StandardQueryParser(default_operator="AND")
    q = p.parse("hash join")
    assert all(o == Occur.MUST for _, o in _occurs(q))
    # OR touches both its operands; the bare third clause stays MUST
    q = p.parse("hash OR join scan")
    assert [o for _, o in _occurs(q)] == [Occur.SHOULD, Occur.SHOULD, Occur.MUST]
    # explicit +/- always wins
    q = p.parse("-hash join")
    assert [o for _, o in _occurs(q)] == [Occur.MUST_NOT, Occur.MUST]


def test_phrase_slop_config():
    assert StandardQueryParser(phrase_slop=3).parse('"hash join"') == PhraseQuery(
        ("hash", "join"), 3
    )
    # explicit ~n wins over the config default
    assert StandardQueryParser(phrase_slop=3).parse('"hash join"~1') == PhraseQuery(
        ("hash", "join"), 1
    )


def test_fuzzy_config():
    assert StandardQueryParser(fuzzy_max_edits=1).parse("quer~") == FuzzyQuery(
        "quer", 1
    )


def test_regexp():
    assert StandardQueryParser().parse("/ha.h/") == RegexpQuery("ha.h")
    q = StandardQueryParser().parse("/a\\/b/")
    assert q == RegexpQuery("a/b")  # escaped slash inside the body


def test_range_bounds():
    p = StandardQueryParser()
    assert p.parse("{hash TO index]") == TermRangeQuery(
        "hash", "index", include_lower=False, include_upper=True
    )
    assert p.parse("{hash TO index}") == TermRangeQuery(
        "hash", "index", include_lower=False, include_upper=False
    )
    assert p.parse("[* TO index]") == TermRangeQuery(
        None, "index", include_lower=True, include_upper=True
    )


def test_leading_wildcard_gate():
    with pytest.raises(QueryParseError):
        StandardQueryParser().parse("*lead")
    assert StandardQueryParser(allow_leading_wildcard=True).parse(
        "*lead"
    ) == WildcardQuery("*lead")


def test_group_with_boost_and_regexp():
    q = StandardQueryParser().parse("(/jo.n/ OR sort)^2 -scan")
    assert isinstance(q, BooleanQuery)
