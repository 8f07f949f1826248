"""Classification module tests (reference `classification`):
SimpleNaiveBayesClassifier math on a hand-computable corpus, and the
KNearestNeighborClassifier class-vote shape."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.classify import knn_classify, naive_bayes_classes


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        # class "a": about cats
        (0, "a", "cat cat purr"),
        (1, "a", "cat whisker purr"),
        (2, "a", "cat nap"),
        # class "b": about dogs
        (3, "b", "dog bark"),
        (4, "b", "dog dog fetch bark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _nb_reference(rows, words):
    """Direct transliteration of SimpleNaiveBayesClassifier.java for
    the assert (docFreq hits, avg-unique-terms denominator, softmax)."""
    docs = [(c, set(t.split())) for _, c, t in rows]
    classes = sorted({c for c, _ in docs})
    docs_with_class = len(docs)
    doc_count = len(docs)
    sum_doc_freq = sum(len(ts) for _, ts in docs)
    avg_unique = sum_doc_freq / doc_count
    out = {}
    for c in classes:
        df_c = sum(1 for cc, _ in docs if cc == c)
        s = math.log(df_c) - math.log(docs_with_class)
        den = avg_unique * df_c + docs_with_class
        for w in words:
            hits = sum(1 for cc, ts in docs if cc == c and w in ts)
            s += math.log((hits + 1) / den)
        out[c] = s
    smax = max(out.values())
    loga = smax + math.log(sum(math.exp(v - smax) for v in out.values()))
    return {c: math.exp(v - loga) for c, v in out.items()}


def test_naive_bayes_matches_reference_math(tiny):
    rows = [(r["doc_id"], r["lang"], r["text"]) for r in tiny.collect()]
    for words in (["cat"], ["dog", "bark"], ["cat", "dog", "cat"], ["purr", "nap"]):
        got = {r["label"]: r["score"] for r in naive_bayes_classes(tiny, words).collect()}
        want = _nb_reference(rows, words)
        assert set(got) == set(want)
        for c in want:
            assert got[c] == pytest.approx(want[c], rel=1e-12), (words, c)


def test_naive_bayes_posteriors_normalized_and_ranked(tiny):
    res = naive_bayes_classes(tiny, ["cat", "purr"]).collect()
    assert sum(r["score"] for r in res) == pytest.approx(1.0, rel=1e-9)
    assert res[0]["label"] == "a" and res[0]["score"] > res[1]["score"]
    res2 = naive_bayes_classes(tiny, ["dog"]).collect()
    assert res2[0]["label"] == "b"


def test_knn_classifier_majority_and_bounds(spark, tiny):
    from lucene_spark.index.builder import InvertedIndex

    idx = InvertedIndex.build(tiny, analyzer="simple", docs_per_segment=8)
    res = knn_classify(idx, tiny, {"cat": 1.0}, k=5).collect()
    # only class-a docs contain "cat": one class, score = sum(s/max)/hits
    assert [r["label"] for r in res] == ["a"]
    assert 0.0 < res[0]["score"] <= 1.0
    # mixed query: both classes present, scores bounded by 1
    res2 = knn_classify(idx, tiny, {"cat": 1.0, "dog": 1.0}, k=5).collect()
    assert {r["label"] for r in res2} == {"a", "b"}
    assert all(0.0 < r["score"] <= 1.0 for r in res2)
    # sumdoc < k correction: with k far above the 5 available hits the
    # denominator falls back to the hit count, so k=50 ranks exactly
    # like k=5 (all 5 docs match at either k)
    res3 = knn_classify(idx, tiny, {"cat": 1.0, "dog": 1.0}, k=50).collect()
    got2 = {r["label"]: r["score"] for r in res2}
    got3 = {r["label"]: r["score"] for r in res3}
    assert set(got2) == set(got3)
    for c in got2:
        assert got3[c] == pytest.approx(got2[c], rel=1e-12)


def _bm25_nb_reference(rows, words, k1=1.2, b=0.75):
    """Direct transliteration of BM25NBClassifier.java for the assert
    (top-1 boolean score = s_c + best word score over class docs)."""

    def dlq(dl):
        if dl < 24 or dl - 24 < 8:
            return dl
        x = dl - 24
        sh = x.bit_length() - 4
        return 24 + ((x >> sh) << sh)

    docs = [(c, t.split()) for _, c, t in rows]
    n_docs = len(docs)
    dls = [len(ts) for _, ts in docs]
    avgdl = sum(dls) / n_docs
    uniq = sorted(set(words))
    df = {w: sum(1 for _, ts in docs if w in ts) for w in uniq}
    idf = {
        w: math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
        for w in uniq
        if df[w] > 0
    }

    def word_score(ts, dl, w):
        f = ts.count(w)
        if f == 0 or w not in idf:
            return 0.0
        return idf[w] * f / (f + k1 * ((1 - b) + b * dlq(dl) / avgdl))

    classes = sorted({c for c, _ in docs})
    out = {}
    for c in classes:
        dfc = sum(1 for cc, _ in docs if cc == c)
        sc = math.log(1.0 + (n_docs - dfc + 0.5) / (dfc + 0.5)) / (1 + k1)
        s = math.log(sc)
        for w in words:
            best = max(
                (
                    word_score(ts, dl, w)
                    for (cc, ts), dl in zip(docs, dls)
                    if cc == c
                ),
                default=0.0,
            )
            s += math.log(sc + best)
        out[c] = s
    smax = max(out.values())
    loga = smax + math.log(sum(math.exp(v - smax) for v in out.values()))
    return {c: math.exp(v - loga) for c, v in out.items()}


def test_bm25_nb_matches_reference_math(spark):
    from lucene_spark.search.classify import bm25_nb_classes

    rows = [
        (0, "a", "cat cat purr"),
        (1, "a", "cat whisker purr " + "pad " * 30),  # dl > 24: quantized
        (2, "a", "cat nap"),
        (3, "b", "dog bark"),
        (4, "b", "dog dog fetch bark cat"),
    ]
    tiny = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    for words in (["cat"], ["dog", "bark"], ["cat", "dog", "cat"], ["purr", "pad"]):
        got = {r["label"]: r["score"] for r in bm25_nb_classes(tiny, words).collect()}
        want = _bm25_nb_reference([(i, c, t) for i, c, t in rows], words)
        assert set(got) == set(want)
        for c in want:
            assert got[c] == pytest.approx(want[c], rel=1e-12), (words, c)
