"""DirectPostingsFormat analog: hot-term in-memory postings cache must
be result-identical to the block-decode path and actually serve hot
terms from the Spark cache."""

import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search.directcache import DirectPostingsCache
from lucene_spark.search.parity import bm25_topk_f64


@pytest.fixture(scope="module")
def idx(spark):
    rows = [
        (i, f"common term{i % 7} extra{'' if i % 2 else ' rare'} filler word")
        for i in range(60)
    ]
    return InvertedIndex.build(
        spark.createDataFrame(rows, "doc_id long, text string"),
        analyzer="simple",
        docs_per_segment=16,
    )


def _res(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_results_identical_hot_only(idx):
    cache = DirectPostingsCache(idx, terms=["common", "rare"])
    try:
        boosts = {"common": 1.0, "rare": 2.0}
        assert _res(cache.bm25_topk(boosts, k=20)) == _res(
            bm25_topk_f64(idx, boosts, k=20)
        )
    finally:
        cache.release()


def test_results_identical_mixed_hot_cold(idx):
    cache = DirectPostingsCache(idx, terms=["common"])
    try:
        boosts = {"common": 1.0, "term3": 1.5, "rare": 0.5}
        assert _res(cache.bm25_topk(boosts, k=20, must_not_terms=["term5"])) == _res(
            bm25_topk_f64(idx, boosts, k=20, must_not_terms=["term5"])
        )
    finally:
        cache.release()


def test_top_df_selection(idx):
    # common/extra/filler/word appear in every doc (df=60); the top-3
    # tie-break is docFreq desc then term asc
    cache = DirectPostingsCache(idx, top_df=3)
    try:
        assert cache.hot_terms == {"common", "extra", "filler"}
        assert cache.num_cached_postings == 180  # 3 terms x 60 docs
    finally:
        cache.release()


def test_hot_path_reads_in_memory_scan(idx):
    cache = DirectPostingsCache(idx, terms=["common"])
    try:
        plan = cache.postings(["common"])._jdf.queryExecution().executedPlan().toString()
        # hot path reads the persisted decoded frame, never re-decodes
        # (the InMemoryRelation's CACHED child plan legitimately shows
        # the original decode — only the part executed above the scan
        # must be decode-free)
        assert "InMemoryTableScan" in plan
        assert "MapInPandas" not in plan.split("InMemoryRelation")[0]
        # cold path runs the block decode (the index's own persisted
        # blocks may still show an InMemoryTableScan underneath)
        cold_plan = (
            cache.postings(["rare"])._jdf.queryExecution().executedPlan().toString()
        )
        assert "MapInPandas" in cold_plan
    finally:
        cache.release()


def test_exactly_one_selector_required(idx):
    with pytest.raises(ValueError):
        DirectPostingsCache(idx)
    with pytest.raises(ValueError):
        DirectPostingsCache(idx, terms=["a"], top_df=2)
