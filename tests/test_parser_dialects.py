"""SimpleQueryParser + surround parser batteries.

Tree-shape tests mirror the operator examples in the reference
javadocs (`queryparser/simple/SimpleQueryParser.java:47-104`,
`queryparser/surround/parser/QueryParser.jj:55-75`), plus one
end-to-end search per dialect.
"""

import pandas as pd
import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search import (
    BooleanQuery,
    FuzzyQuery,
    IndexSearcher,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    QueryParseError,
    SpanNearQuery,
    TermQuery,
    WildcardQuery,
    simple_parse,
    surround_parse,
)


def occurs(q):
    assert isinstance(q, BooleanQuery)
    return [(c.occur, c.query) for c in q.clauses]


class TestSimpleParser:
    def test_and(self):
        q = simple_parse("token1+token2")
        assert occurs(q) == [
            (Occur.MUST, TermQuery("token1")),
            (Occur.MUST, TermQuery("token2")),
        ]

    def test_or_default(self):
        q = simple_parse("token1 token2")
        assert [o for o, _ in occurs(q)] == [Occur.SHOULD, Occur.SHOULD]

    def test_right_to_left_precedence(self):
        # "token1 | token2 + token3": (t1 OR t2) AND t3
        q = simple_parse("token1 | token2 + token3")
        cl = occurs(q)
        assert cl[0][0] == Occur.MUST and cl[1][0] == Occur.MUST
        inner = cl[0][1]
        assert [o for o, _ in occurs(inner)] == [Occur.SHOULD, Occur.SHOULD]
        assert cl[1][1] == TermQuery("token3")

    def test_negation_wrap(self):
        q = simple_parse("-token0")
        cl = occurs(q)
        assert (Occur.MUST_NOT, TermQuery("token0")) in cl
        assert (Occur.SHOULD, MatchAllDocsQuery()) in cl

    def test_double_negation(self):
        assert simple_parse("--token0") == TermQuery("token0")

    def test_phrase_and_near(self):
        assert simple_parse('"quick brown fox"') == PhraseQuery(
            ("quick", "brown", "fox"), 0
        )
        assert simple_parse('"term1 term2"~5') == PhraseQuery(
            ("term1", "term2"), 5
        )

    def test_prefix_fuzzy(self):
        assert simple_parse("term*") == PrefixQuery("term")
        assert simple_parse("term~1") == FuzzyQuery("term", 1)
        assert simple_parse("term~") == FuzzyQuery("term", 2)
        assert simple_parse("term~0") == TermQuery("term")
        # fuzziness above the automaton max clamps to 2
        assert simple_parse("term~9") == FuzzyQuery("term", 2)

    def test_match_all_star(self):
        assert simple_parse("*") == MatchAllDocsQuery()
        assert isinstance(simple_parse("   "), MatchNoDocsQuery)

    def test_lenient_unbalanced(self):
        # never raises: '(' and '"' without closers are extraneous
        q = simple_parse("(token1 token2")
        assert [o for o, _ in occurs(q)] == [Occur.SHOULD, Occur.SHOULD]
        q2 = simple_parse('"token1 token2')
        assert [o for o, _ in occurs(q2)] == [Occur.SHOULD, Occur.SHOULD]

    def test_escaped_minus_is_term(self):
        # \-term1 searches the term, not a negation
        q = simple_parse(r"\-term1")
        assert not isinstance(q, BooleanQuery) or all(
            o != Occur.MUST_NOT for o, _ in occurs(q)
        )

    def test_precedence_groups(self):
        q = simple_parse("token1 + (token2 | token3)")
        cl = occurs(q)
        assert cl[0] == (Occur.MUST, TermQuery("token1"))
        assert [o for o, _ in occurs(cl[1][1])] == [Occur.SHOULD, Occur.SHOULD]

    def test_empty_group_resets_operation(self):
        q = simple_parse("token1 + () token2")
        # "()" resets the pending MUST; default OR applies
        assert [o for o, _ in occurs(q)] == [Occur.SHOULD, Occur.SHOULD]


class TestSurroundParser:
    def test_infix_distance(self):
        assert surround_parse("hash 3W join") == SpanNearQuery(
            ("hash", "join"), slop=2, in_order=True
        )
        assert surround_parse("hash N join") == SpanNearQuery(
            ("hash", "join"), slop=0, in_order=False
        )

    def test_prefix_distance(self):
        assert surround_parse("3w(a, b, c)") == SpanNearQuery(
            ("a", "b", "c"), slop=2, in_order=True
        )
        assert surround_parse("20n(a, b)") == SpanNearQuery(
            ("a", "b"), slop=19, in_order=False
        )

    def test_flat_infix_chain(self):
        # one flat operand list per level, last distance token wins
        assert surround_parse("a 3W b 3W c") == SpanNearQuery(
            ("a", "b", "c"), slop=2, in_order=True
        )

    def test_boolean_precedence(self):
        # OR binds loosest: a AND b OR c == (a AND b) OR c
        q = surround_parse("a and b or c")
        cl = occurs(q)
        assert cl[0][0] == Occur.SHOULD and cl[1][0] == Occur.SHOULD
        assert [o for o, _ in occurs(cl[0][1])] == [Occur.MUST, Occur.MUST]

    def test_not(self):
        q = surround_parse("a not b")
        assert occurs(q) == [
            (Occur.MUST, TermQuery("a")),
            (Occur.MUST_NOT, TermQuery("b")),
        ]

    def test_prefix_bool(self):
        q = surround_parse("or(a, b, and(c, d))")
        cl = occurs(q)
        assert [o for o, _ in cl] == [Occur.SHOULD] * 3
        assert [o for o, _ in occurs(cl[2][1])] == [Occur.MUST, Occur.MUST]

    def test_truncation(self):
        assert surround_parse("journal*") == PrefixQuery("journal")
        assert surround_parse("te?t") == WildcardQuery("te?t")
        with pytest.raises(QueryParseError):
            surround_parse("jo*")  # MINIMUM_PREFIX_LENGTH = 3

    def test_rejects_bad_input(self):
        for bad in ["(a", "a 3w", "w(a)", "not(a, b)", "3w(a or b, c)"]:
            with pytest.raises(QueryParseError):
                surround_parse(bad)


def _mini_index(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "hash join is fast",
                "join the hash set",
                "merge sort scan",
                "hash partition join",
            ],
        }
    )
    return InvertedIndex.build(
        spark.createDataFrame(pdf),
        analyzer="simple",
        docs_per_segment=4,
        positions=True,
    )


def test_simple_parse_end_to_end(spark):
    idx = _mini_index(spark)
    s = IndexSearcher(idx)
    hits = {
        r["doc_id"]
        for r in s.search(simple_parse("hash + join + -sort"), k=10).collect()
    }
    assert hits == {0, 1, 3}


def test_surround_end_to_end(spark):
    idx = _mini_index(spark)
    s = IndexSearcher(idx)
    # ordered adjacency: only doc 0 has "hash join" adjacent in order
    hits = {
        r["doc_id"] for r in s.search(surround_parse("hash w join"), k=10).collect()
    }
    assert hits == {0}
    # within 3 positions, unordered: docs 0, 1, 3
    hits = {
        r["doc_id"]
        for r in s.search(surround_parse("3n(hash, join)"), k=10).collect()
    }
    assert hits == {0, 1, 3}


# --- ComplexPhraseQueryParser ----------------------------------------------


def test_complex_phrase(spark):
    import pandas as pd

    from lucene_spark.index import InvertedIndex
    from lucene_spark.search.complexphrase import (
        complex_phrase_docs,
        parse_complex_phrase,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(5),
                "text": [
                    "hash join fast",
                    "hashing join",
                    "hash merge",
                    "fast hash join",
                    "join hash",
                ],
            }
        )
    )
    idx = InvertedIndex.build(
        docs, analyzer="simple", docs_per_segment=4, positions=True
    )
    assert parse_complex_phrase("ha* (join OR merge) slow") == [
        ["ha*"],
        ["join", "merge"],
        ["slow"],
    ]
    got = lambda p, **kw: sorted(
        r["doc_id"] for r in complex_phrase_docs(idx, p, **kw).collect()
    )
    assert got("ha* join") == [0, 1, 3]           # wildcard slot
    assert got("hash (join merge)") == [0, 2, 3]  # alternation slot
    assert got("join hash", in_order=False) == [0, 3, 4]
    assert got("hashing~1 join") == [1]           # fuzzy slot
    assert got("hash fast", slop=1) == [0]        # one gap allowed
    assert got("zzz* join") == []                 # empty expansion


def test_complex_phrase_unbalanced_raises(spark):
    import pytest as _pytest

    from lucene_spark.search.complexphrase import parse_complex_phrase

    with _pytest.raises(ValueError):
        parse_complex_phrase("(a b")


# --- XML CoreParser dialect ------------------------------------------------


def test_xml_parse_tree():
    from lucene_spark.search.query import (
        BooleanQuery,
        BoostQuery,
        DisjunctionMaxQuery,
        MatchAllDocsQuery,
        Occur,
        SpanNearQuery,
        TermQuery,
        TermRangeQuery,
    )
    from lucene_spark.search.xmlparser import xml_parse

    q = xml_parse(
        '<BooleanQuery minimumNumberShouldMatch="1" boost="2.0">'
        '<Clause occurs="must"><TermQuery>hash</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery boost="1.5">join</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>scan</TermQuery></Clause>'
        "</BooleanQuery>"
    )
    assert isinstance(q, BoostQuery) and q.boost == 2.0
    bq = q.query
    assert isinstance(bq, BooleanQuery)
    assert bq.minimum_number_should_match == 1
    assert [c.occur for c in bq.clauses] == [Occur.MUST, Occur.SHOULD, Occur.MUST_NOT]
    assert isinstance(bq.clauses[1].query, BoostQuery)

    sn = xml_parse(
        "<SpanNear slopNum='2' inOrder='true'>"
        "<SpanTerm>hash</SpanTerm><SpanTerm>join</SpanTerm></SpanNear>"
    )
    assert sn == SpanNearQuery(("hash", "join"), slop=2, in_order=True)

    rq = xml_parse("<RangeQuery lowerTerm='merge' upperTerm='sort' includeUpper='false'/>")
    assert isinstance(rq, TermRangeQuery) and not rq.include_upper

    assert isinstance(xml_parse("<MatchAllDocsQuery/>"), MatchAllDocsQuery)
    dm = xml_parse(
        "<DisjunctionMaxQuery tieBreaker='0.3'>"
        "<TermQuery>a</TermQuery><TermQuery>b</TermQuery></DisjunctionMaxQuery>"
    )
    assert isinstance(dm, DisjunctionMaxQuery) and dm.tie_breaker == 0.3
    # UserQuery = classic parser passthrough
    uq = xml_parse("<UserQuery>hash AND join</UserQuery>")
    assert isinstance(uq, BooleanQuery)


def test_xml_parse_errors():
    import pytest as _pytest

    from lucene_spark.search.xmlparser import xml_parse

    with _pytest.raises(ValueError, match="malformed"):
        xml_parse("<BooleanQuery>")
    with _pytest.raises(ValueError, match="unsupported"):
        xml_parse("<NoSuchQuery/>")
    with _pytest.raises(ValueError, match="occurs"):
        xml_parse(
            "<BooleanQuery><Clause occurs='perhaps'><TermQuery>x</TermQuery>"
            "</Clause></BooleanQuery>"
        )
    with _pytest.raises(ValueError, match="slopNum"):
        xml_parse("<SpanNear><SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear>")


def test_xml_query_executes(spark, documents):
    from lucene_spark.index import InvertedIndex
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.xmlparser import xml_parse

    idx = InvertedIndex.build(documents, analyzer="simple", docs_per_segment=256)
    q = xml_parse(
        "<BooleanQuery><Clause occurs='must'><TermQuery>hash</TermQuery></Clause>"
        "<Clause occurs='mustNot'><TermQuery>scan</TermQuery></Clause></BooleanQuery>"
    )
    rows = IndexSearcher(idx).search(q, k=10).collect()
    assert rows and all(r["score"] > 0 for r in rows)


def test_xml_spanor_is_one_slot(spark):
    """<SpanOr> inside <SpanNear> is ONE slot of alternatives, not
    extra conjunctive clauses (review finding)."""
    import pandas as pd

    from lucene_spark.index import InvertedIndex
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import SpanNearQuery
    from lucene_spark.search.xmlparser import xml_parse

    q = xml_parse(
        "<SpanNear slopNum='0' inOrder='true'>"
        "<SpanOr><SpanTerm>fast</SpanTerm><SpanTerm>slow</SpanTerm></SpanOr>"
        "<SpanTerm>join</SpanTerm></SpanNear>"
    )
    assert q == SpanNearQuery((("fast", "slow"), "join"), slop=0, in_order=True)
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(4),
                "text": [
                    "slow join now",     # matches (slow join), no 'fast'
                    "fast join here",    # matches (fast join)
                    "fast slow merge",   # no 'join' adjacency
                    "join fast",         # wrong order
                ],
            }
        )
    )
    idx = InvertedIndex.build(
        docs, analyzer="simple", docs_per_segment=4, positions=True
    )
    got = sorted(r["doc_id"] for r in IndexSearcher(idx).search(q, k=10).collect())
    assert got == [0, 1]
