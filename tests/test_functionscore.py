"""FunctionScoreQuery: boostByValue / replace / boostByQuery vs a
python float64 oracle built on the reference BM25 implementation in
ref_impl."""

import math
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.index import InvertedIndex
from lucene_spark.search.functionscore import boost_by_query_topk, function_score_topk

VOCAB = ["hash", "join", "scan", "sort", "merge", "row", "key"]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(5)
    texts = [
        " ".join(rng.choice(VOCAB, size=rng.randint(3, 20))) for _ in range(120)
    ]
    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, n_chars long",
    )
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=32)
    return texts, docs, idx


def _bm25_scores(texts, terms):
    """float64 BM25 (k1=1.2, b=0.75, lossy norm) per doc for a SHOULD
    disjunction — mirrors parity._bm25_scored_f64."""
    from lucene_spark.functions.smallfloat import byte4_to_int, int_to_byte4

    tok = [t.split(" ") for t in texts]
    n = len(texts)
    sttf = sum(len(ts) for ts in tok)
    avgdl = sttf / n
    df = {
        w: sum(1 for ts in tok if w in ts) for w in terms
    }
    out = {}
    for d, ts in enumerate(tok):
        s = 0.0
        dlq = int(byte4_to_int(int_to_byte4(np.int64(len(ts)))))
        for w, boost in terms.items():
            f = ts.count(w)
            if f == 0 or df[w] == 0:
                continue
            idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
            s += boost * idf * f / (f + 1.2 * (1 - 0.75 + 0.75 * dlq / avgdl))
        if s > 0:
            out[d] = s
    return out


def _topk(d, k):
    return sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_boost_by_value(corpus):
    texts, docs, idx = corpus
    tb = {"hash": 1.0, "join": 0.5}
    got = function_score_topk(
        idx,
        tb,
        docs,
        F.col("n_chars") / (F.col("n_chars") + F.lit(100.0)),
        mode="multiply",
        k=12,
    ).collect()
    base = _bm25_scores(texts, tb)
    want = {
        d: s * (len(texts[d]) / (len(texts[d]) + 100.0)) for d, s in base.items()
    }
    exp = _topk(want, 12)
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, round(s, 4)) for d, s in exp
    ]


def test_replace_mode(corpus):
    texts, docs, idx = corpus
    tb = {"merge": 1.0}
    got = function_score_topk(
        idx, tb, docs, F.col("n_chars").cast("double"), mode="replace", k=8
    ).collect()
    base = _bm25_scores(texts, tb)
    want = {d: float(len(texts[d])) for d in base}
    exp = _topk(want, 8)
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, round(s, 4)) for d, s in exp
    ]


def test_boost_by_query(corpus):
    texts, docs, idx = corpus
    tb = {"hash": 1.0}
    got = boost_by_query_topk(idx, tb, {"scan": 1.0}, boost_value=3.0, k=10).collect()
    base = _bm25_scores(texts, tb)
    want = {
        d: s * (3.0 if "scan" in texts[d].split(" ") else 1.0)
        for d, s in base.items()
    }
    exp = _topk(want, 10)
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, round(s, 4)) for d, s in exp
    ]


def test_bad_mode(corpus):
    _, docs, idx = corpus
    with pytest.raises(ValueError):
        function_score_topk(idx, {"hash": 1.0}, docs, F.lit(1.0), mode="add")


def test_sparse_doc_values_keep_match_set(corpus):
    """A doc with no doc-values row stays in the match set at score 0
    (FunctionScoreQuery: DoubleValues.advanceExact false → 0), it does
    not vanish from the result."""
    texts, docs, idx = corpus
    tb = {"hash": 1.0}
    matching = sorted(_bm25_scores(texts, tb))
    keep = matching[: len(matching) // 2]  # doc-values only for half
    sparse = docs.filter(F.col("doc_id").isin([int(d) for d in keep]))
    got = function_score_topk(
        idx, tb, sparse, F.col("n_chars").cast("double"), mode="replace",
        k=len(matching),
    ).collect()
    assert {r["doc_id"] for r in got} == set(matching)
    dropped = set(matching) - set(keep)
    assert all(r["score"] == 0.0 for r in got if r["doc_id"] in dropped)
