"""IndriAndQuery: boost-weighted-mean belief AND with smoothing scores
(IndriAndScorer.java:45, TermScorer.smoothingScore)."""

import math

import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search.indriand import indri_and_topk


@pytest.fixture(scope="module")
def idx(spark):
    rows = [
        (0, "a a b"),   # matches both
        (1, "a c c"),   # matches a only
        (2, "c c c"),   # matches none -> not a candidate
        (3, "b b b"),   # matches b only
    ]
    return InvertedIndex.build(
        spark.createDataFrame(rows, "doc_id long, text string"),
        analyzer="simple",
        docs_per_segment=2,
    )


def _indri(freq, ttf, dl, sttf, mu=2000.0):
    return math.log((freq + mu * (ttf / sttf)) / (dl + mu))


def test_weighted_mean_with_smoothing(idx):
    rows = indri_and_topk(idx, {"a": 1.0, "b": 3.0}, k=10).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    sttf = 12.0
    ttf_a, ttf_b = 3.0, 4.0
    # doc 0: a freq2, b freq1, dl3
    want0 = (1.0 * _indri(2, ttf_a, 3, sttf) + 3.0 * _indri(1, ttf_b, 3, sttf)) / 4.0
    # doc 1: a freq1, b SMOOTHED freq0, dl3
    want1 = (1.0 * _indri(1, ttf_a, 3, sttf) + 3.0 * _indri(0, ttf_b, 3, sttf)) / 4.0
    # doc 3: a smoothed, b freq3
    want3 = (1.0 * _indri(0, ttf_a, 3, sttf) + 3.0 * _indri(3, ttf_b, 3, sttf)) / 4.0
    assert got[0] == pytest.approx(round(want0, 4), abs=1e-4)
    assert got[1] == pytest.approx(round(want1, 4), abs=1e-4)
    assert got[3] == pytest.approx(round(want3, 4), abs=1e-4)
    # doc 2 matches no clause -> not in the candidate union
    assert 2 not in got
    # ordering: negative log-probs, best (least negative) first
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_absent_terms_drop_like_null_scorers(idx):
    with_absent = {
        r["doc_id"]: r["score"]
        for r in indri_and_topk(idx, {"a": 1.0, "zz": 5.0}, k=10).collect()
    }
    alone = {
        r["doc_id"]: r["score"]
        for r in indri_and_topk(idx, {"a": 1.0}, k=10).collect()
    }
    assert with_absent == alone


def test_all_absent_empty(idx):
    assert indri_and_topk(idx, {"zz": 1.0}, k=5).count() == 0
