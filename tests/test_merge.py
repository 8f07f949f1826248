"""Merge policies + merge job: plan shapes, postings equivalence, lineage."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.functions.forutil import fordelta_decode, pfor_decode
from lucene_spark.index import InvertedIndex
from lucene_spark.index.merge import (
    SegmentInfo,
    force_merge,
    log_merge_plan,
    merge_segments,
    segment_infos,
    tiered_merge_plan,
)
from lucene_spark.search import IndexSearcher, TermQuery


def test_log_merge_plan_levels():
    # 25 level-0 segments with merge_factor 10 → two merges of 10
    segs = [SegmentInfo(i, 500) for i in range(25)]
    plan = log_merge_plan(segs, merge_factor=10, floor_docs=1000)
    assert len(plan) == 2
    assert all(len(g) == 10 for g in plan)
    # big segments land in a higher level and don't merge with small ones
    segs += [SegmentInfo(100 + i, 10_000_000) for i in range(3)]
    plan2 = log_merge_plan(segs, merge_factor=10, floor_docs=1000)
    merged_ids = {i for g in plan2 for i in g}
    assert not any(100 + i in merged_ids for i in range(3))


def test_tiered_merge_plan_budget():
    segs = [SegmentInfo(i, 1000) for i in range(40)]
    plan = tiered_merge_plan(segs, segs_per_tier=8.0, floor_docs=1000)
    assert plan, "40 equal segments exceed an 8-per-tier budget"
    assert all(2 <= len(g) <= 10 for g in plan)
    # respects max_merged_docs
    segs2 = [SegmentInfo(i, 10**9) for i in range(20)]
    plan2 = tiered_merge_plan(segs2, max_merged_docs=2 * 10**9)
    assert all(len(g) <= 2 for g in plan2)


def _postings_map(idx, term):
    rows = idx.blocks.filter(F.col("term") == term).collect()
    out = {}
    for r in rows:
        docs = fordelta_decode(bytes(r["docs_packed"]))
        freqs = pfor_decode(bytes(r["freqs_packed"]))
        norms = np.frombuffer(bytes(r["norms_raw"]), dtype=np.uint8)
        for d, f, n in zip(docs, freqs, norms):
            assert int(d) not in out, "doc duplicated across blocks"
            out[int(d)] = (int(f), int(n))
    return out


@pytest.fixture(scope="module")
def small_index(spark):
    rng = np.random.RandomState(3)
    texts = [
        " ".join(rng.choice(["alpha", "beta", "gamma", "delta"], size=rng.randint(1, 30)))
        for _ in range(520)
    ]
    pdf = pd.DataFrame({"doc_id": range(520), "text": texts})
    # docs_per_segment=32 → 17 segments
    return InvertedIndex.build(spark.createDataFrame(pdf), analyzer="simple", docs_per_segment=32)


def test_merge_preserves_postings_and_results(small_index):
    before = {t: _postings_map(small_index, t) for t in ["alpha", "beta"]}
    infos = segment_infos(small_index)
    assert len(infos) == 17
    plan = log_merge_plan(infos, merge_factor=10, floor_docs=64)
    assert plan, "17 small segments should produce at least one merge"
    merged = merge_segments(small_index, plan)
    infos2 = segment_infos(merged)
    assert len(infos2) < len(infos)
    for t in before:
        assert _postings_map(merged, t) == before[t]
    # search results identical pre/post merge
    s1 = [(r["doc_id"], r["score"]) for r in IndexSearcher(small_index).search(TermQuery("alpha"), 20).collect()]
    s2 = [(r["doc_id"], r["score"]) for r in IndexSearcher(merged).search(TermQuery("alpha"), 20).collect()]
    assert s1 == s2
    assert merged.metrics["last_merge_fan_in"] == 10


def test_force_merge_single_segment(small_index):
    one = force_merge(small_index)
    infos = segment_infos(one)
    assert len(infos) == 1
    # blocks fully re-chunked: every block except per-term tails is 128 docs
    rows = one.blocks.collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    for term, blocks in by_term.items():
        blocks.sort(key=lambda r: r["block_ord"])
        assert all(b["num_docs"] == 128 for b in blocks[:-1]), term


def test_merge_on_flush_plan_selects_small_segments(small_index):
    from lucene_spark.index.merge import merge_on_flush_plan

    infos = segment_infos(small_index)  # 17 segments of <=32 docs
    plan = merge_on_flush_plan(infos, small_segment_threshold_docs=64)
    # every segment is sub-threshold -> ONE merge of all of them
    assert len(plan) == 1
    assert sorted(plan[0]) == sorted(s.segment_id for s in infos)
    # above-threshold segments stay out
    plan2 = merge_on_flush_plan(infos, small_segment_threshold_docs=1)
    assert plan2 == []
    # already-merging segments are excluded (FilterMergePolicy contract)
    merging = [s.segment_id for s in infos[:-1]]
    plan3 = merge_on_flush_plan(
        infos, small_segment_threshold_docs=64, merging=merging
    )
    assert plan3 == []  # only one candidate left -> null spec


def test_merge_on_flush_single_segment_and_results(small_index):
    from lucene_spark.index.merge import merge_on_flush_plan

    infos = segment_infos(small_index)
    plan = merge_on_flush_plan(infos, small_segment_threshold_docs=64)
    merged = merge_segments(small_index, plan)
    assert len(segment_infos(merged)) == 1
    s1 = [
        (r["doc_id"], r["score"])
        for r in IndexSearcher(small_index).search(TermQuery("gamma"), 20).collect()
    ]
    s2 = [
        (r["doc_id"], r["score"])
        for r in IndexSearcher(merged).search(TermQuery("gamma"), 20).collect()
    ]
    assert s1 == s2
