"""TokenStreamToTermAutomatonQuery analog: token stream → automaton
(`sandbox/search/TokenStreamToTermAutomatonQuery.java:35`)."""

import pytest

from lucene_spark.search.termautomaton import (
    doc_position_frame,
    term_automaton_freqs,
    token_stream_to_automaton,
)


def _freqs(spark, rows, stream):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    auto = token_stream_to_automaton(stream)
    pos = doc_position_frame(docs)
    return {r["doc_id"]: r["freq"] for r in term_automaton_freqs(pos, auto).collect()}


def test_phrase_stream(spark):
    got = _freqs(
        spark,
        [(0, "a b c"), (1, "a c b"), (2, "x a b a b")],
        [("a", 1, 1), ("b", 1, 1)],
    )
    assert got == {0: 1, 2: 2}


def test_synonym_graph_side_path(spark):
    # "wifi" (posLength 2) || "wi fi": both surface forms match
    stream = [("wifi", 1, 2), ("wi", 0, 1), ("fi", 1, 1), ("net", 1, 1)]
    got = _freqs(
        spark,
        [(0, "wifi net"), (1, "wi fi net"), (2, "wi net"), (3, "net wifi")],
        stream,
    )
    assert got == {0: 1, 1: 1}


def test_star_any_transition(spark):
    got = _freqs(
        spark,
        [(0, "hash big join"), (1, "hash join"), (2, "hash x join y")],
        [("hash", 1, 1), ("*", 1, 1), ("join", 1, 1)],
    )
    assert got == {0: 1, 2: 1}


def test_hole_raises_unless_clamped(spark):
    with pytest.raises(ValueError):
        token_stream_to_automaton([("a", 1, 1), ("b", 2, 1)])
    auto = token_stream_to_automaton(
        [("a", 1, 1), ("b", 2, 1)], preserve_position_increments=False
    )
    # clamped to a plain 2-term phrase
    assert {(s, d, t) for s, d, t in auto.transitions} == {
        (0, 1, "a"),
        (1, 2, "b"),
    }


def test_empty_stream_raises(spark):
    with pytest.raises(ValueError):
        token_stream_to_automaton([])


def test_first_token_needs_increment(spark):
    with pytest.raises(ValueError):
        token_stream_to_automaton([("a", 0, 1)])
