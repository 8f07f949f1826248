"""Skew handling: universal terms, mega-docs, heavy-hitter splitting."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex, check_index
from lucene_spark.search import IndexSearcher, TermQuery


def test_universal_term_splits_across_segments(spark):
    """A term in EVERY doc (Zipf head) must never form one giant
    posting list: segment partitioning bounds every (segment, term)
    group at docs_per_segment postings (the heavy-hitter splitting of
    the north rule)."""
    n, dps = 2000, 128
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("common x"), (F.col("id") % 50).cast("string")).alias("text"),
    )
    idx = InvertedIndex.build(df, analyzer="simple", docs_per_segment=dps)
    per_group = (
        idx.blocks.filter(F.col("term") == "common")
        .groupBy("segment_id")
        .agg(F.sum("num_docs").alias("n"))
        .collect()
    )
    assert len(per_group) == (n + dps - 1) // dps  # split across every segment
    assert all(r["n"] <= dps for r in per_group)  # bounded sub-lists
    # stats still exact
    st = idx.terms.filter(F.col("term") == "common").collect()[0]
    assert st["doc_freq"] == n and st["total_term_freq"] == n
    # and searchable
    assert IndexSearcher(idx).search(TermQuery("common"), 5).count() == 5


def test_mega_doc_and_empty_docs(spark):
    """One pathologically long doc + empty docs build correctly."""
    rng = np.random.default_rng(3)
    mega = " ".join(f"w{int(x)}" for x in rng.integers(0, 500, size=60000))
    rows = [(0, "tiny doc"), (1, ""), (2, mega), (3, "tiny doc again")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = InvertedIndex.build(df, analyzer="simple", docs_per_segment=2)
    # empty doc contributes nothing
    assert idx.doc_count == 3
    assert idx.sum_total_term_freq == 2 + 60000 + 3
    # norm byte saturates via SmallFloat (lossy but bounded)
    mega_norm = idx.norms.filter(F.col("doc_id") == 2).collect()[0]
    assert mega_norm["dl"] == 60000
    report = check_index(idx)
    assert all(v == 0 for v in report.values()), report


def test_zipf_segment_group_bound(spark):
    """On a realistic Zipf corpus no (segment, term) group exceeds
    docs_per_segment rows — the build's shuffle is skew-bounded."""
    from lucene_spark.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, 3000, seed=11, num_partitions=8, with_doc_id=True)
    dps = 256
    idx = InvertedIndex.build(corpus, analyzer="standard", docs_per_segment=dps)
    worst = (
        idx.blocks.groupBy("segment_id", "term")
        .agg(F.sum("num_docs").alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    assert worst <= dps
