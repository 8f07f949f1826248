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
