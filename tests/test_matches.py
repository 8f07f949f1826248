"""Matches API analog semantics (search/NamedMatches.java:44,
MatchesIterator.java:33): which named sub-queries matched, and the
per-term match positions surface."""

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search.matches import named_matches, term_match_positions


def _idx(spark):
    docs = spark.createDataFrame(
        [
            (0, "hash join hash", "en", "s", 14),
            (1, "merge sort", "en", "s", 10),
            (2, "scan only here", "en", "s", 14),
            (3, "plain text", "en", "s", 10),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return InvertedIndex.build(docs, analyzer="simple", positions=True)


def test_named_matches(spark):
    idx = _idx(spark)
    rows = named_matches(
        idx, {"a": ["hash"], "b": ["merge", "scan"], "c": ["plain"]}
    ).collect()
    assert [(r.doc_id, r.names, r.n_matched) for r in rows] == [
        (0, "a", 1),
        (1, "b", 1),
        (2, "b", 1),
        (3, "c", 1),
    ]


def test_named_matches_multiple_names_per_doc(spark):
    idx = _idx(spark)
    rows = named_matches(idx, {"a": ["hash"], "b": ["join"]}).collect()
    assert [(r.doc_id, r.names, r.n_matched) for r in rows] == [(0, "a|b", 2)]


def test_term_match_positions(spark):
    idx = _idx(spark)
    rows = term_match_positions(idx, ["hash", "join"]).collect()
    assert [(r.doc_id, r.term, r.positions, r.freq) for r in rows] == [
        (0, "hash", "0,2", 2),
        (0, "join", "1", 1),
    ]


def test_exact_first_suggest_outranks_weight(spark):
    # AnalyzingSuggester.java:716 — the exact key precedes a
    # higher-weight completion
    from lucene_spark.search.suggest import exact_first_suggest

    docs = spark.createDataFrame(
        [(i, "agg x" if i < 5 else ("a y" if i < 8 else "ab z"), "en", "s", 5)
         for i in range(10)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    idx = InvertedIndex.build(docs, analyzer="simple", positions=False)
    rows = exact_first_suggest(idx, "a", n=3).collect()
    assert [(r.term, r.is_exact) for r in rows] == [
        ("a", 1), ("agg", 0), ("ab", 0),
    ]


def test_span_payload_check_ops(spark):
    # SpanPayloadCheckQuery.java:54 + PayloadMatcherFactory MatchOperation:
    # payload = token index via the delimited-payload chain
    from lucene_spark.analysis.filters import delimited_payload_analyzer
    from lucene_spark.search.payloads import span_payload_check

    docs = spark.createDataFrame(
        [
            (0, "w|0 hash|1 hash|2", "en", "s", 10),
            (1, "hash|0 x|1", "en", "s", 10),
            (2, "y|0 z|1", "en", "s", 10),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    idx = InvertedIndex.build(
        docs, analyzer=delimited_payload_analyzer(), positions=True, payloads=True
    )
    rows = span_payload_check(idx, "hash", op="lt", value=2.0).collect()
    assert [(r.doc_id, r.n_matching, r.positions) for r in rows] == [
        (0, 1, "1"),
        (1, 1, "0"),
    ]
    rows = span_payload_check(idx, "hash", op="eq", value=2.0).collect()
    assert [(r.doc_id, r.positions) for r in rows] == [(0, "2")]
    rows = span_payload_check(idx, "hash", op="gte", value=0.0).collect()
    assert [(r.doc_id, r.n_matching) for r in rows] == [(0, 2), (1, 1)]
