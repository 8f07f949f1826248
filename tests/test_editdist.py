"""Damerau-Levenshtein fuzzy matching + queryparser hyphen semantics +
monitor sloppy-phrase consistency (round-2 ADVICE fixes)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.functions.editdist import damerau_levenshtein
from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    Occur,
    TermQuery,
)
from lucene_spark.search.queryparser import parse_query


def test_damerau_levenshtein_values():
    # transposition = 1 edit; full (unrestricted) variant, matching
    # DuckDB's damerau_levenshtein (ca->ac->abc = 2, not OSA's 3)
    assert damerau_levenshtein("teh", "the") == 1
    assert damerau_levenshtein("ca", "abc") == 2
    assert damerau_levenshtein("", "abc") == 3
    assert damerau_levenshtein("abc", "abc") == 0
    assert damerau_levenshtein("quer", "query") == 1
    assert damerau_levenshtein("jion", "join") == 1
    assert damerau_levenshtein("kitten", "sitting") == 3


def test_fuzzy_query_transpositions_rewrite(spark):
    from lucene_spark.search.query import rewrite

    terms = spark.createDataFrame(
        [("the", 5, 5), ("join", 3, 3), ("zzz", 1, 1)],
        "term string, doc_freq long, total_term_freq long",
    )
    # "teh"~1 reaches "the" only with transpositions (Lucene default)
    rw = rewrite(FuzzyQuery("teh", 1), terms)
    # single matched term unwraps to ConstantScore(TermQuery('the'))
    assert isinstance(rw.query, TermQuery) and rw.query.term == "the"
    rw_plain = rewrite(FuzzyQuery("teh", 1, transpositions=False), terms)
    from lucene_spark.search.query import MatchNoDocsQuery

    assert isinstance(rw_plain, MatchNoDocsQuery)


def test_hyphenated_word_is_one_term():
    q = parse_query("hash-join")
    assert isinstance(q, BooleanQuery)
    assert all(c.occur == Occur.SHOULD for c in q.clauses)
    assert {c.query.term for c in q.clauses} == {"hash", "join"}


def test_leading_minus_still_negates():
    q = parse_query("hash -join")
    occ = {c.query.term: c.occur for c in q.clauses}
    assert occ == {"hash": Occur.SHOULD, "join": Occur.MUST_NOT}


def test_plus_inside_term():
    q = parse_query("c++ rocks")
    # 'c++' analyzes to the single token 'c'
    terms = {c.query.term for c in q.clauses}
    assert terms == {"c", "rocks"}


def test_monitor_sloppy_phrase_matches_forward_search(spark):
    from lucene_spark.index import InvertedIndex
    from lucene_spark.search.positional import phrase_freqs
    from lucene_spark.streaming.monitor import match_monitor_queries

    docs = spark.createDataFrame(
        [
            (0, "hash quick join here"),      # gap 1 -> slop 1 fires
            (1, "hash join adjacent"),        # exact
            (2, "hash one two three join x"), # gap 3 -> needs slop 3
            (3, "join before hash"),          # reversed: slop 2 alignment
            (4, "no phrase at all"),
        ],
        "doc_id long, text string",
    )
    alert = parse_query('"hash join"~2')
    got = {
        r["doc_id"]
        for r in match_monitor_queries(docs, [("a1", alert)]).collect()
    }
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=8, positions=True)
    want = {
        r["doc_id"]
        for r in phrase_freqs(idx, ["hash", "join"], slop=2).collect()
        if r["freq"] > 0
    }
    assert got == want and 0 in got and 1 in got and 2 not in got


def test_spellcheck_ranking(spark):
    from lucene_spark.index import InvertedIndex
    from lucene_spark.search.spellcheck import suggest_corrections

    docs = spark.createDataFrame(
        [
            (0, "query query query engine"),
            (1, "quart of quarry stone"),
            (2, "query tuning"),
            (3, "unrelated words"),
        ],
        "doc_id long, text string",
    )
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=4)
    rows = suggest_corrections(idx, "quary", max_edits=2, num_suggestions=3).collect()
    got = [(r["suggestion"], r["distance"]) for r in rows]
    # all distance 1 (query: transposition; quarry: insert; quart:
    # substitute) → ranked by doc_freq desc then alphabetically
    assert got == [("query", 1), ("quarry", 1), ("quart", 1)]
