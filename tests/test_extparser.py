"""ExtendableQueryParser analog vs the reference ext tests
(TestExtendableQueryParser / TestExtensions / ExtensionStub)."""

import pytest

from lucene_spark.search.extparser import (
    ExtensionQuery,
    Extensions,
    QueryParseError,
    escape,
    extendable_parse,
)
from lucene_spark.search.query import (
    BooleanQuery,
    Occur,
    TermQuery,
)


def stub(components: ExtensionQuery):
    """ExtensionStub.java: TermQuery(field, rawQueryString) — raw, not
    analyzed."""
    return TermQuery(components.raw_query_string)


# --- Extensions contract (TestExtensions.java) -----------------------------


def test_split_extension_field():
    ext = Extensions()
    assert ext.split_extension_field("deflt", "field") == ("field", None)
    assert ext.split_extension_field("deflt", "field:key") == ("field", "key")
    # leading delimiter -> default field
    assert ext.split_extension_field("deflt", ":key") == ("deflt", "key")
    # split at the FIRST occurrence; the remainder keeps later delims
    assert ext.split_extension_field("deflt", "a:b:c") == ("a", "b:c")


def test_split_custom_delimiter():
    ext = Extensions("-")
    assert ext.split_extension_field("deflt", "field-key") == ("field", "key")
    assert ext.split_extension_field("deflt", "-key") == ("deflt", "key")


def test_build_inverts_split():
    for delim in (":", "-", "|"):
        ext = Extensions(delim)
        built = ext.build_extension_field("testExt", "aField")
        # invert through the parser's unescape + split
        import re

        unescaped = re.sub(r"\\(.)", r"\1", built)
        assert ext.split_extension_field("deflt", unescaped) == (
            "aField",
            "testExt",
        )


def test_escape():
    assert escape("a:b") == "a\\:b"
    assert escape("foo & bar") == "foo \\& bar"


# --- parser dispatch (TestExtendableQueryParser.java) ----------------------


def test_ext_field_unquoted():
    ext = Extensions()
    ext.add("testExt", stub)
    # "aField\:testExt:foo bar" -> stub(foo) SHOULD + classic(bar)
    q = extendable_parse("aField\\:testExt:foo bar", ext)
    assert isinstance(q, BooleanQuery)
    assert len(q.clauses) == 2
    assert q.clauses[0].query == TermQuery("foo")
    assert q.clauses[0].occur == Occur.SHOULD
    assert q.clauses[1].query == TermQuery("bar")


def test_ext_default_field_quoted():
    ext = Extensions()
    ext.add("testExt", stub)
    # ":testExt:\"foo \\& bar\"" -> stub gets the raw unescaped string
    q = extendable_parse(':testExt:"foo \\& bar"', ext)
    assert q == TermQuery("foo & bar")


def test_ext_custom_delimiter_unquoted():
    ext = Extensions("|")
    ext.add("testExt", stub)
    q = extendable_parse("aField|testExt:foo", ext)
    assert q == TermQuery("foo")


def test_unescaped_delimiter_raises():
    ext = Extensions()
    ext.add("testExt", stub)
    with pytest.raises(QueryParseError):
        extendable_parse('aField:testExt:"foo \\& bar"', ext)


def test_unregistered_key_falls_back_to_classic():
    ext = Extensions()
    # no extensions registered: "title:hash" is a plain field query ->
    # single-field engine strips the field and analyzes the term
    q = extendable_parse("title:hash", ext)
    assert q == TermQuery("hash")


def test_classic_syntax_passthrough():
    ext = Extensions()
    ext.add("x", stub)
    q = extendable_parse("+hash -join merge", ext)
    assert isinstance(q, BooleanQuery)
    occurs = [c.occur for c in q.clauses]
    assert occurs == [Occur.MUST, Occur.MUST_NOT, Occur.SHOULD]
