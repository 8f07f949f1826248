"""FastVectorHighlighter analog: differential vs the re-analysis
highlighter, hit-set restriction, and block-prune behavior."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.search.highlight import best_passages, fvh_best_passages


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, " ".join(
            ("hash join sort merge scan" if (i + j) % 7 == 0 else f"tok{j % 11} filler")
            for j in range(30)
        ))
        for i in range(120)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def idx(corpus):
    return InvertedIndex.build(
        corpus, analyzer="simple", docs_per_segment=32, positions=True
    )


def test_fvh_matches_reanalysis_exactly(spark, corpus, idx):
    terms = ["hash", "merge"]
    uni = {
        tuple(r)
        for r in best_passages(corpus, terms, window=8, quantize=6).collect()
    }
    fvh = {
        tuple(r)
        for r in fvh_best_passages(idx, corpus, terms, window=8, quantize=6).collect()
    }
    assert uni and fvh == uni


def test_fvh_hit_set_restriction(spark, corpus, idx):
    hits = [0, 7, 14, 21]
    rows = fvh_best_passages(
        idx, corpus, ["hash"], window=8, quantize=6, doc_ids=hits
    ).collect()
    assert rows and {r["doc_id"] for r in rows} <= set(hits)
    # restricted output rows equal the full run filtered to the hits
    full = fvh_best_passages(idx, corpus, ["hash"], window=8, quantize=6).collect()
    want = {tuple(r) for r in full if r["doc_id"] in set(hits)}
    assert {tuple(r) for r in rows} == want


def test_fvh_multi_passage_ranks(spark, corpus, idx):
    rows = fvh_best_passages(
        idx, corpus, ["hash", "merge"], window=8, quantize=6, n_passages=2
    ).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r["passage_rank"])
        scores = [r["passage_score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_fvh_no_matching_terms_empty(spark, corpus, idx):
    assert fvh_best_passages(idx, corpus, ["zzz_absent"]).count() == 0


def test_fvh_requires_positions(spark, corpus):
    bare = InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=32)
    with pytest.raises(ValueError):
        fvh_best_passages(bare, corpus, ["hash"]).collect()
