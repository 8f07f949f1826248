"""Incremental append + streaming ingestion: appended index ≡ full rebuild."""

import os

import pandas as pd
import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search import IndexSearcher, TermQuery
from lucene_spark.streaming import append_batch, index_stream

BATCH1 = ["fast fox", "slow fox", "the hound"]
BATCH2 = ["fox again", "hound and fox", "nothing here"]


def _hits(searcher, term, k=10):
    return [(r["doc_id"], r["score"]) for r in searcher.search(TermQuery(term), k).collect()]


def test_append_equals_rebuild(spark):
    df1 = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1, 2], "text": BATCH1}))
    df2 = spark.createDataFrame(pd.DataFrame({"doc_id": [3, 4, 5], "text": BATCH2}))
    full = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(6), "text": BATCH1 + BATCH2})
    )
    idx_inc = append_batch(InvertedIndex.build(df1, docs_per_segment=4), df2)
    idx_full = InvertedIndex.build(full, docs_per_segment=4)
    assert idx_inc.doc_count == idx_full.doc_count
    assert idx_inc.sum_total_term_freq == idx_full.sum_total_term_freq
    t_inc = {r["term"]: (r["doc_freq"], r["total_term_freq"]) for r in idx_inc.terms.collect()}
    t_full = {r["term"]: (r["doc_freq"], r["total_term_freq"]) for r in idx_full.terms.collect()}
    assert t_inc == t_full
    assert _hits(IndexSearcher(idx_inc), "fox") == _hits(IndexSearcher(idx_full), "fox")


def test_streaming_ingestion_with_checkpoint(spark, tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    ckpt = str(tmp_path / "ckpt")
    idx_dir = str(tmp_path / "idx")
    df1 = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1, 2], "text": BATCH1}))
    df1.write.parquet(inp + "/b1")
    seen = []
    q = index_stream(
        spark,
        inp + "/*",
        "doc_id long, text string",
        idx_dir,
        ckpt,
        on_batch=lambda idx, epoch: seen.append(idx.doc_count),
    )
    q.awaitTermination(120)
    assert seen and seen[-1] == 3
    loaded = InvertedIndex.load(spark, idx_dir)
    assert loaded.doc_count == 3
    hits = _hits(IndexSearcher(loaded), "fox")
    assert [d for d, _ in hits] == [0, 1]
