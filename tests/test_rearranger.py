"""IndexRearranger analog (misc/index/IndexRearranger.java:28):
prescribed segment-per-selector layout, selection validation, and the
deletedDocsSelector path."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.index.rearranger import rearrange


def _corpus(spark, n=20):
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(n), "text": [f"alpha beta w{i % 5}" for i in range(n)]}
        )
    )


def test_one_segment_per_selector(spark):
    corpus = _corpus(spark)
    idx, mapping = rearrange(
        corpus,
        [F.col("doc_id") % 3 == 0, F.col("doc_id") % 3 == 1, F.col("doc_id") % 3 == 2],
    )
    by_seg = {
        r["segment_id"]: r["n"]
        for r in mapping.groupBy("segment_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_seg == {0: 7, 1: 7, 2: 6}
    # selector order preserved: selector i -> segment i
    rows = mapping.collect()
    for r in rows:
        assert r["segment_id"] == r["orig_doc_id"] % 3


def test_segment_content_matches_selector(spark):
    corpus = _corpus(spark)
    idx, mapping = rearrange(
        corpus, [F.col("doc_id") < 12, F.col("doc_id") >= 12]
    )
    # postings of w0 (docs 0,5,10,15) split 3 / 1 across the segments
    w0 = (
        idx.blocks.filter(F.col("term") == "w0")
        .groupBy("segment_id")
        .agg(F.sum("num_docs").alias("n"))
        .collect()
    )
    assert {r["segment_id"]: r["n"] for r in w0} == {0: 3, 1: 1}


def test_unselected_doc_raises(spark):
    corpus = _corpus(spark)
    with pytest.raises(ValueError, match="selected zero or multiple"):
        rearrange(corpus, [F.col("doc_id") < 10])


def test_doubly_selected_doc_raises(spark):
    corpus = _corpus(spark)
    with pytest.raises(ValueError, match="selected zero or multiple"):
        rearrange(corpus, [F.col("doc_id") < 10, F.col("doc_id") < 20])


def test_deleted_docs_selector_marks_without_merge(spark):
    corpus = _corpus(spark)
    idx, mapping = rearrange(
        corpus,
        [F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1],
        deleted_selector=F.col("doc_id") % 10 == 9,
    )
    assert idx.num_deleted == 2  # ORIGINAL docs 9 and 19
    # the tombstoned NEW ids must map back to original ids 9 and 19
    # (the selector is written against the original corpus)
    doomed_new = {r["doc_id"] for r in idx.deletes.collect()}
    back = {
        r["orig_doc_id"]
        for r in mapping.filter(F.col("doc_id").isin(list(doomed_new))).collect()
    }
    assert back == {9, 19}
    # postings were NOT merged away — blocks still carry the doomed docs
    total = (
        idx.blocks.filter(F.col("term") == "alpha")
        .agg(F.sum("num_docs").alias("n"))
        .collect()[0]["n"]
    )
    assert total == 20


def test_requires_selectors(spark):
    with pytest.raises(ValueError, match="at least one"):
        rearrange(_corpus(spark), [])


def test_uneven_selectors_report_one_segment_each(spark):
    corpus = _corpus(spark, n=7)
    idx, mapping = rearrange(
        corpus,
        [F.col("doc_id") < 5, F.col("doc_id") == 5, F.col("doc_id") == 6],
    )
    # prescribed layout: one segment per selector even with sparse tails
    assert idx.num_segments == 3
    segs = {r["segment_id"] for r in mapping.collect()}
    assert segs == {0, 1, 2}
