"""Monitor (reverse search / percolation) vs forward search agreement."""

from __future__ import annotations

import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search import (
    ConstantScoreQuery,
    IndexSearcher,
    parse_query,
    rewrite,
)
from lucene_spark.streaming.monitor import match_monitor_queries

QUERIES = [
    ("q_term", "hash"),
    ("q_and", "hash AND join"),
    ("q_not", "merge -sort"),
    ("q_phrase", '"hash join"'),
    ("q_prefix", "spar*"),
    ("q_fuzzy", "quer~1"),
    ("q_msm", "(hash OR sort OR merge)"),
]


@pytest.fixture(scope="module")
def monitor_matches(spark, documents):
    qs = [(qid, parse_query(s)) for qid, s in QUERIES]
    rows = match_monitor_queries(documents, qs).collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["doc_id"])
    return out


def test_monitor_agrees_with_forward_search(spark, documents, monitor_matches):
    """Reverse search must flag exactly the docs forward search finds."""
    idx = InvertedIndex.build(
        documents, analyzer="simple", docs_per_segment=256, positions=True
    )
    searcher = IndexSearcher(idx)
    for qid, s in QUERIES:
        q = rewrite(ConstantScoreQuery(parse_query(s)), idx.terms)
        ctx = searcher._bind(q)
        forward = {
            r["doc_id"] for r in searcher._matching_docs(q, ctx).distinct().collect()
        }
        assert monitor_matches.get(qid, set()) == forward, qid


def test_monitor_streaming_foreach_batch(spark, documents, tmp_path):
    """The same matcher runs inside Structured Streaming foreachBatch."""
    src = str(tmp_path / "in")
    documents.limit(50).write.parquet(src)
    qs = [("alert", parse_query("hash AND join"))]
    got = []

    def handle(batch_df, epoch_id):
        got.extend(
            (r["doc_id"], r["query_id"])
            for r in match_monitor_queries(batch_df, qs).collect()
        )

    q = (
        spark.readStream.schema(documents.schema)
        .parquet(src)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    expected = {
        r["doc_id"]
        for r in documents.limit(50)
        .filter("text like '%hash%' and text like '%join%'")
        .collect()
        if "hash" in r["text"].split() and "join" in r["text"].split()
    }
    assert {d for d, _ in got} == expected


def test_presearcher_required_terms_rules():
    from lucene_spark.search import parse_query
    from lucene_spark.search.query import MatchAllDocsQuery, PrefixQuery
    from lucene_spark.streaming.monitor import _required_terms

    assert _required_terms(parse_query("hash")) == frozenset({"hash"})
    # conjunction: one bounded clause suffices
    assert _required_terms(parse_query("hash AND join")) in (
        frozenset({"hash"}),
        frozenset({"join"}),
    )
    # pure disjunction: union of all clauses
    assert _required_terms(parse_query("hash OR join")) == frozenset(
        {"hash", "join"}
    )
    # any unbounded SHOULD clause spoils the bound
    assert _required_terms(parse_query("hash OR spar*")) is None
    assert _required_terms(MatchAllDocsQuery()) is None
    assert _required_terms(PrefixQuery("ha")) is None
    # phrase needs all its terms -> first term bounds it
    assert _required_terms(parse_query('"hash join"')) == frozenset({"hash"})
    # MUST_NOT never bounds
    assert _required_terms(parse_query("-hash")) is None


def test_presearcher_equivalence_many_queries(spark):
    """Pre-filtered evaluation returns exactly the brute-force result
    over a mixed registry (bounded + unbounded queries)."""
    from lucene_spark.search import parse_query
    from lucene_spark.streaming.monitor import (
        _matches,
        match_monitor_queries,
    )

    docs = spark.createDataFrame(
        [
            (0, "hash join group"),
            (1, "sort merge scan"),
            (2, "hash sort"),
            (3, "alpha beta gamma"),
        ],
        ["doc_id", "text"],
    )
    registry = [
        ("q_hash", parse_query("hash")),
        ("q_and", parse_query("hash AND join")),
        ("q_or", parse_query("sort OR merge")),
        ("q_not", parse_query("merge -scan")),
        ("q_prefix", parse_query("gam*")),
        ("q_phrase", parse_query('"hash join"')),
        ("q_msm", parse_query("hash join group")),
    ]
    got = {
        (r["doc_id"], r["query_id"])
        for r in match_monitor_queries(docs, registry).collect()
    }
    brute = set()
    for doc_id, text in docs.collect():
        toks = [(t, p) for p, t in enumerate(text.split(" ")) if t]
        tf = {}
        for t, _ in toks:
            tf[t] = tf.get(t, 0) + 1
        for qid, q in registry:
            if _matches(q, tf, toks):
                brute.add((doc_id, qid))
    assert got == brute and got
