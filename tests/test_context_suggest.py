"""ContextQuery / ContextSuggestField analog
(`suggest/document/ContextQuery.java:63`): prefix completion filtered
and boosted by per-suggestion contexts, best score kept across
contexts, all-contexts default."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.suggest import context_suggest


@pytest.fixture(scope="module")
def sug(spark):
    rows = [
        ("spark", "en", 10),
        ("spark", "de", 4),
        ("sparkle", "en", 3),
        ("spartan", "fr", 7),
        ("scala", "en", 9),
    ]
    return spark.createDataFrame(rows, "suggestion string, context string, weight long")


def test_all_contexts_default(sug):
    got = [(r.suggestion, r.score) for r in context_suggest(sug, "spa").collect()]
    # addAllContexts(): boost 1, best weight per suggestion
    assert got == [("spark", 10.0), ("spartan", 7.0), ("sparkle", 3.0)]


def test_context_filter_and_boost(sug):
    got = [
        (r.suggestion, r.score)
        for r in context_suggest(sug, "spa", {"de": 3.0, "fr": 1.0}).collect()
    ]
    # en-only suggestions filtered out; spark scores via its de row
    assert got == [("spark", 12.0), ("spartan", 7.0)]


def test_best_matching_context_wins(sug):
    got = dict(
        (r.suggestion, r.score)
        for r in context_suggest(sug, "spark", {"en": 1.0, "de": 5.0}).collect()
    )
    # spark: max(10*1, 4*5) = 20
    assert got["spark"] == 20.0


def test_prefix_context_match(sug):
    got = [
        (r.suggestion, r.score)
        for r in context_suggest(sug, "s", {"e": 2.0}, exact=False).collect()
    ]
    # 'e' prefix-matches only 'en' contexts
    assert got == [("spark", 20.0), ("scala", 18.0), ("sparkle", 6.0)]


def test_no_match_empty(sug):
    assert context_suggest(sug, "zz").count() == 0
    assert context_suggest(sug, "spa", {"it": 1.0}).count() == 0
