"""Best-passage highlighting + CoveringQuery: goldens vs hand-computed
passages and a brute-force covering oracle.
"""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.search.covering import covering_matches
from lucene_spark.search.highlight import best_passages

_DOCS = [
    (0, "a b hash c d e f g hash join hash join e f"),
    (1, "hash a b c d e f g h i j k l m n"),
    (2, "x y z w v u t s r q"),
    (3, "join join a b c d e f hash g"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, ["doc_id", "text"]).cache()


def _brute_best(text, terms, window):
    toks = text.split(" ")
    n_docs = len(_DOCS)
    df = {
        t: sum(1 for _, txt in _DOCS if t in txt.split(" ")) for t in terms
    }
    idf = {t: math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)) for t in terms}
    best = None
    for wstart in range(1, len(toks) + 1, window):
        seg = toks[wstart - 1 : wstart - 1 + window]
        score = sum(idf[t] for t in seg if t in idf)
        if score > 0 and (best is None or score > best[1] + 1e-12):
            best = (wstart, score, " ".join(seg))
    return best


def test_best_passages_golden(docs):
    got = {
        r["doc_id"]: (r["passage_start"], r["passage_score"], r["passage"])
        for r in best_passages(docs, ["hash", "join"], window=4).collect()
    }
    assert 2 not in got  # no match, no highlight
    for doc_id, text in _DOCS:
        want = _brute_best(text, ["hash", "join"], 4)
        if want is None:
            assert doc_id not in got
        else:
            ws, sc, seg = want
            assert got[doc_id][0] == ws
            assert got[doc_id][1] == pytest.approx(round(sc, 4), abs=1e-4)
            assert got[doc_id][2] == seg


def test_best_passages_tie_earliest(spark):
    d = spark.createDataFrame(
        [(0, "hash a b c hash d e f")], ["doc_id", "text"]
    )
    r = best_passages(d, ["hash"], window=4).collect()[0]
    # windows [1..4] and [5..8] both score one idf — earliest wins
    assert r["passage_start"] == 1
    assert r["passage"] == "hash a b c"


def test_covering_matches(spark, docs):
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=4)
    th = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 1), (3, 1)], ["doc_id", "min_match"]
    )
    got = {
        r["doc_id"]: r["nmatch"]
        for r in covering_matches(idx, ["hash", "join", "x"], th).collect()
    }
    # doc0: hash+join=2 >= 2 ok; doc1: hash=1 < 2 out; doc2: x=1 >= 1 ok;
    # doc3: hash+join=2 >= 1 ok
    assert got == {0: 2, 2: 1, 3: 2}


def test_covering_missing_threshold_doc_excluded(spark, docs):
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=4)
    th = spark.createDataFrame([(0, 1)], ["doc_id", "min_match"])
    got = {r["doc_id"] for r in covering_matches(idx, ["hash"], th).collect()}
    assert got == {0}
