"""Early-terminated sorted top-k (TopFieldCollector.canEarlyTerminate
analog, `search/TopFieldCollector.java:147` + `index/Sorter.java:34`).

The distributed re-expression: index sort makes docID == sort rank, so
top-k is `doc_id < bound` — a partition filter (segments never opened)
plus a pushed parquet filter (row-group pruning in the boundary
segment). With tombstones the bound widens until k LIVE docs are
covered (Lucene's "k competitive hits" loop, as a driver fixpoint over
tiny counts).
"""

from pyspark.sql import functions as F

from lucene_spark.index.sorting import (
    early_terminated_topk,
    save_sorted,
    sort_docs,
)


def _corpus(spark, n=200):
    # score is a permutation of 0..n-1 so sort order is deterministic
    return spark.createDataFrame(
        [(i, (i * 73) % n, f"doc {i}") for i in range(n)],
        "doc_id long, score long, body string",
    )


def _store(spark, tmp_path, n=200, dps=32):
    corpus = _corpus(spark, n)
    s = sort_docs(corpus, [F.col("score").desc(), F.col("orig_doc_id")])
    path = str(tmp_path / "sorted")
    save_sorted(s, path, docs_per_segment=dps)
    return corpus, path


def test_matches_full_sort(spark, tmp_path):
    corpus, path = _store(spark, tmp_path)
    got = [
        (r.orig_doc_id, r.score)
        for r in early_terminated_topk(spark, path, k=10).collect()
    ]
    want = [
        (r.doc_id, r.score)
        for r in corpus.orderBy(F.col("score").desc(), "doc_id").limit(10).collect()
    ]
    assert got == want and len(got) == 10


def test_partition_and_pushed_filters(spark, tmp_path):
    _, path = _store(spark, tmp_path, n=200, dps=32)
    plan = (
        early_terminated_topk(spark, path, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # segment dirs past the bound are pruned from the listing,
    # and the docID bound reaches the parquet scan
    assert "PartitionFilters" in plan and "seg" in plan
    assert "PushedFilters" in plan and "LessThan(doc_id," in plan


def test_deleted_docs_widen_bound(spark, tmp_path):
    corpus, path = _store(spark, tmp_path)
    # delete the top 7 of the sorted order (doc_ids 0..6 in the store)
    deleted = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    got = [
        (r.orig_doc_id, r.score)
        for r in early_terminated_topk(spark, path, k=10, deleted=deleted).collect()
    ]
    # oracle: same sort over the corpus minus the 7 best-scoring docs
    top7 = {
        r.doc_id
        for r in corpus.orderBy(F.col("score").desc(), "doc_id").limit(7).collect()
    }
    want = [
        (r.doc_id, r.score)
        for r in corpus.filter(~F.col("doc_id").isin(list(top7)))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
        .collect()
    ]
    assert got == want and len(got) == 10


def test_k_exceeds_corpus(spark, tmp_path):
    corpus, path = _store(spark, tmp_path, n=50, dps=16)
    got = early_terminated_topk(spark, path, k=500).collect()
    assert len(got) == 50
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_sorted_range_query_matches_full_scan(spark, tmp_path):
    from lucene_spark.index.sorting import sorted_range_query

    corpus = _corpus(spark, 200)
    s = sort_docs(corpus, [F.col("score").asc(), F.col("orig_doc_id")])
    path = str(tmp_path / "rq")
    save_sorted(s, path, docs_per_segment=32, stats_cols=["score"])
    got = {
        (r.orig_doc_id, r.score)
        for r in sorted_range_query(spark, path, "score", 40, 75).collect()
    }
    want = {
        (r.doc_id, r.score)
        for r in corpus.filter(F.col("score").between(40, 75)).collect()
    }
    assert got == want and len(got) == 36


def test_sorted_range_query_prunes_segments(spark, tmp_path):
    from lucene_spark.index.sorting import sorted_range_query

    s = sort_docs(_corpus(spark, 200), [F.col("score").asc(), F.col("orig_doc_id")])
    path = str(tmp_path / "rq2")
    save_sorted(s, path, docs_per_segment=32, stats_cols=["score"])
    plan = (
        sorted_range_query(spark, path, "score", 0, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the manifest binary search becomes a partition filter on seg
    assert "PartitionFilters" in plan and "seg" in plan
    # scores 0..10 are ranks 0..10 -> only segment 0 survives
    import re

    assert re.search(r"seg#?\d* <= 0\)", plan)


def test_sorted_range_query_unbounded_and_empty(spark, tmp_path):
    from lucene_spark.index.sorting import sorted_range_query

    corpus = _corpus(spark, 60)
    s = sort_docs(corpus, [F.col("score").asc(), F.col("orig_doc_id")])
    path = str(tmp_path / "rq3")
    save_sorted(s, path, docs_per_segment=16, stats_cols=["score"])
    assert sorted_range_query(spark, path, "score", lo=50).count() == 10
    assert sorted_range_query(spark, path, "score", hi=None, lo=None).count() == 60
    assert sorted_range_query(spark, path, "score", 1000, 2000).count() == 0


def test_sorted_range_query_no_stats_fallback(spark, tmp_path):
    from lucene_spark.index.sorting import sorted_range_query

    corpus = _corpus(spark, 60)
    s = sort_docs(corpus, [F.col("score").asc(), F.col("orig_doc_id")])
    path = str(tmp_path / "rq4")
    save_sorted(s, path, docs_per_segment=16)  # no stats_cols
    got = sorted_range_query(spark, path, "score", 10, 20).count()
    assert got == 11
