"""SolrSynonymParser / WordnetSynonymParser analogs vs the reference
formats (TestSolrSynonymParser / TestWordnetSynonymParser shapes)."""

import pytest

from lucene_spark.analysis.synparser import (
    parse_solr_synonyms,
    parse_wordnet_synonyms,
    synonym_map,
)


def test_solr_equivalence_expand():
    rules = parse_solr_synonyms("a, b, c")
    assert set(rules) == {
        ("a", "b", True), ("a", "c", True),
        ("b", "a", True), ("b", "c", True),
        ("c", "a", True), ("c", "b", True),
    }


def test_solr_equivalence_contract():
    rules = parse_solr_synonyms("a, b, c", expand=False)
    # everything (including a itself) maps to the FIRST entry
    assert rules == [("a", "a", False), ("b", "a", False), ("c", "a", False)]


def test_solr_explicit_mapping_never_keeps_original():
    rules = parse_solr_synonyms("i-pod, ipod => ipod")
    assert rules == [("i-pod", "ipod", False), ("ipod", "ipod", False)]


def test_solr_comments_blank_case_multiword():
    text = "# comment\n\nFoo Bar, foobar\n"
    rules = parse_solr_synonyms(text)
    assert ("foo bar", "foobar", True) in rules
    assert ("foobar", "foo bar", True) in rules


def test_solr_escapes():
    rules = parse_solr_synonyms("a\\,a => b\\,b")
    assert rules == [("a,a", "b,b", False)]
    rules = parse_solr_synonyms("a\\=>a => b\\=>b")
    assert rules == [("a=>a", "b=>b", False)]


def test_solr_double_explicit_raises():
    with pytest.raises(ValueError):
        parse_solr_synonyms("a => b => c")


WN = """s(100000001,1,'wood',n,1,0).
s(100000001,2,'forest',n,1,0).
s(100000002,1,'wolfish',a,1,0).
s(100000002,2,'ravenous',a,1,0).
s(100000003,1,'king''s evil',n,1,1).
"""


def test_wordnet_synsets():
    rules = parse_wordnet_synonyms(WN)
    assert ("wood", "forest", True) in rules
    assert ("forest", "wood", True) in rules
    assert ("wolfish", "ravenous", True) in rules
    # singleton synset contributes nothing
    assert all("king" not in a for a, _, _ in rules)


def test_wordnet_quote_unescape():
    text = (
        "s(100000009,1,'king''s meat',n,1,0).\n"
        "s(100000009,2,'meat',n,1,0).\n"
    )
    rules = parse_wordnet_synonyms(text)
    assert ("king's meat", "meat", True) in rules


def test_wordnet_contract_mode():
    rules = parse_wordnet_synonyms(WN, expand=False)
    assert ("forest", "wood", False) in rules
    assert ("wood", "wood", False) in rules


def test_synonym_map_shaping():
    m = synonym_map(parse_solr_synonyms("a, b\nc => d, e"))
    assert m == {"a": ["b"], "b": ["a"], "c": ["d", "e"]}


def test_end_to_end_with_expand_filter(spark):
    from pyspark.sql import functions as F

    from lucene_spark.analysis.filters import synonym_expand, whitespace_tokens

    m = synonym_map(parse_solr_synonyms("quick, fast\nbig => large"))
    df = spark.createDataFrame([(0, "the quick big fox")], "doc_id long, text string")
    rows = (
        df.select(
            F.flatten(synonym_expand(whitespace_tokens(F.col("text")), m)).alias("t")
        )
        .collect()
    )
    assert rows[0]["t"] == ["the", "quick", "fast", "big", "large", "fox"]


WN_REFERENCE_FIXTURE = (
    "s(100000001,1,'woods',n,1,0).\n"
    "s(100000001,2,'wood',n,1,0).\n"
    "s(100000001,3,'forest',n,1,0).\n"
    "s(100000002,1,'wolfish',n,1,0).\n"
    "s(100000002,2,'ravenous',n,1,0).\n"
    "s(100000003,1,'king',n,1,1).\n"
    "s(100000003,2,'baron',n,1,1).\n"
    "s(100000004,1,'king''s evil',n,1,1).\n"
    "s(100000004,2,'king''s meany',n,1,1).\n"
)


def test_wordnet_reference_fixture(spark):
    """TestWordnetSynonymParser.synonymsFile end-to-end: the single-
    token expansions match the reference's analyzer assertions."""
    from pyspark.sql import functions as F

    from lucene_spark.analysis.filters import synonym_expand, whitespace_tokens

    rules = parse_wordnet_synonyms(WN_REFERENCE_FIXTURE)
    m = synonym_map(rules)
    # 3-way synset expands all-pairs
    assert set(m["woods"]) == {"wood", "forest"}
    assert set(m["forest"]) == {"woods", "wood"}
    # single-quote unescape inside multi-word entries
    assert set(m["king's evil"]) == {"king's meany"}
    # "king" expands to "baron" exactly like assertAnalyzesTo
    df = spark.createDataFrame([(0, "Lost in the woods")], "doc_id long, text string")
    toks = df.select(
        F.flatten(
            synonym_expand(whitespace_tokens(F.lower(F.col("text"))), m)
        ).alias("t")
    ).collect()[0]["t"]
    assert toks == ["lost", "in", "the", "woods", "wood", "forest"]
