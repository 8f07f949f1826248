"""BlendedTermQuery (core/search/BlendedTermQuery.java:47): blended
max-df statistics and the two rewrite methods."""

import math

import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search.blended import blended_term_topk
from lucene_spark.search.parity import B, K1


@pytest.fixture(scope="module")
def idx(spark):
    # 'common' df=8; 'rare' df=1 — unblended idf would make any
    # rare-matching doc dominate
    rows = [(i, "common filler" + (" rare" if i == 0 else "")) for i in range(8)]
    return InvertedIndex.build(
        spark.createDataFrame(rows, "doc_id long, text string"),
        analyzer="simple",
        docs_per_segment=4,
    )


def _expected(freq, dl, n, sttf, dfb, boost):
    idf = math.log(1 + (n - dfb + 0.5) / (dfb + 0.5))
    return boost * idf * freq / (freq + K1 * (1 - B + B * dl / (sttf / n)))


def test_blended_df_is_max(idx):
    rows = blended_term_topk(idx, {"common": 1.0, "rare": 1.0}, k=8).collect()
    scores = {r["doc_id"]: r["score"] for r in rows}
    n, sttf = 8, 8 * 2 + 1
    # doc 0: common(freq1, dl3) and rare(freq1, dl3) BOTH at df=8;
    # dismax: max + 0.01*(sum-max); dl quantization is identity at
    # these tiny lengths
    s_c = _expected(1, 3, n, sttf, 8, 1.0)
    s_r = _expected(1, 3, n, sttf, 8, 1.0)
    want0 = max(s_c, s_r) + 0.01 * (s_c + s_r - max(s_c, s_r))
    assert scores[0] == pytest.approx(round(want0, 4), abs=1e-4)
    # docs 1..7: only 'common', dl=2
    want1 = _expected(1, 2, n, sttf, 8, 1.0)
    assert scores[1] == pytest.approx(round(want1, 4), abs=1e-4)


def test_boolean_rewrite_sums(idx):
    dis = {r["doc_id"]: r["score"] for r in blended_term_topk(
        idx, {"common": 1.0, "rare": 1.0}, k=8, rewrite="dismax"
    ).collect()}
    boo = {r["doc_id"]: r["score"] for r in blended_term_topk(
        idx, {"common": 1.0, "rare": 1.0}, k=8, rewrite="boolean"
    ).collect()}
    # single-term docs identical; the two-term doc sums fully
    assert boo[1] == dis[1]
    assert boo[0] > dis[0]


def test_rare_term_damped(idx):
    # WITH blending the rare-matching doc cannot outrank via tiny df:
    # under dismax its extra clause adds only tie=1%, which does not
    # even offset its longer length — a shorter common-only doc wins.
    # (Unblended, 'rare' idf ~ln(17/1.5) vs ln(17/8.5) would make doc 0
    # dominate by far.)
    rows = blended_term_topk(idx, {"common": 1.0, "rare": 1.0}, k=8).collect()
    assert rows[0]["doc_id"] != 0
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert max(scores.values()) / scores[0] < 1.2  # all within a damped band


def test_absent_terms(idx):
    assert blended_term_topk(idx, {"nosuchterm": 1.0}, k=5).count() == 0


def test_bad_rewrite_rejected(idx):
    with pytest.raises(ValueError):
        blended_term_topk(idx, {"common": 1.0}, rewrite="phrase")
