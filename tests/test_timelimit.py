"""Time-limited search (core/search/TimeLimitingBulkScorer.java:28 +
IndexSearcher timeout contract): partial results, first-interval
guarantee, no-budget equivalence."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.search.parity import _bm25_scored_f64
from lucene_spark.search.timelimit import time_limited_topk


def _idx(spark, n=64):
    texts = [
        "apple banana" if i % 4 == 0 else "cherry date elderberry"
        for i in range(n)
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(n), "text": texts})
    )
    return InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=8)


def test_no_budget_equals_full_search(spark):
    idx = _idx(spark)
    full = {
        (r["doc_id"], round(r["s"], 6))
        for r in _bm25_scored_f64(idx, {"apple": 1.0})
        .orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(10)
        .collect()
    }
    topk, timed_out = time_limited_topk(idx, {"apple": 1.0}, k=10)
    assert not timed_out
    got = {(r["doc_id"], round(r["s"], 6)) for r in topk.collect()}
    assert got == full


def test_expired_clock_returns_first_chunk_only(spark):
    idx = _idx(spark)
    # clock advancing 1s per call: budget 0 expires after chunk 0
    t = {"now": 0.0}

    def clock():
        t["now"] += 1000.0
        return t["now"]

    topk, timed_out = time_limited_topk(
        idx, {"apple": 1.0}, k=10, budget_ms=0.0,
        chunk_segments=2, clock_ms=clock,
    )
    assert timed_out
    rows = topk.collect()
    assert rows  # first interval always scored
    # chunk 0 = segments {0,1} = doc ids [0, 16)
    assert all(r["doc_id"] < 16 for r in rows)


def test_generous_budget_never_times_out(spark):
    idx = _idx(spark)
    topk, timed_out = time_limited_topk(
        idx, {"apple": 1.0}, k=5, budget_ms=10 * 60 * 1000.0
    )
    assert not timed_out
    assert len(topk.collect()) == 5


def test_partial_scores_match_prefix_search(spark):
    idx = _idx(spark)
    import dataclasses

    prefix_view = dataclasses.replace(
        idx, blocks=idx.blocks.filter(F.col("segment_id") < 2)
    )
    expect = {
        (r["doc_id"], round(r["s"], 6))
        for r in _bm25_scored_f64(prefix_view, {"apple": 1.0})
        .orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(10)
        .collect()
    }
    t = {"now": 0.0}

    def clock():
        t["now"] += 1000.0
        return t["now"]

    topk, timed_out = time_limited_topk(
        idx, {"apple": 1.0}, k=10, budget_ms=0.0,
        chunk_segments=2, clock_ms=clock,
    )
    assert timed_out
    got = {(r["doc_id"], round(r["s"], 6)) for r in topk.collect()}
    assert got == expect


def test_validates_chunk_segments(spark):
    idx = _idx(spark, n=16)
    with pytest.raises(ValueError):
        time_limited_topk(idx, {"apple": 1.0}, chunk_segments=0)
