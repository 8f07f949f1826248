"""Span queries vs a brute-force position oracle (ordered/unordered
SpanNear, SpanFirst) on a randomized corpus."""

import os
import sys
from itertools import permutations, product

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.index import InvertedIndex
from lucene_spark.search.spans import span_first_docs, span_near_docs

VOCAB = ["hash", "join", "scan", "sort", "merge", "x", "y"]


@pytest.fixture(scope="module")
def span_corpus(spark):
    rng = np.random.RandomState(11)
    texts = [
        " ".join(rng.choice(VOCAB, size=rng.randint(2, 15))) for _ in range(80)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=16, positions=True)
    return texts, idx


def _brute_near(texts, terms, slop, in_order):
    out = set()
    n = len(terms)
    for d, t in enumerate(texts):
        toks = t.split(" ")
        pos = {w: [i for i, x in enumerate(toks) if x == w] for w in set(terms)}
        if any(not pos[w] for w in terms):
            continue
        for combo in product(*[pos[w] for w in terms]):
            if len(set(combo)) != n:
                continue  # spans must not overlap
            if in_order and any(combo[i] >= combo[i + 1] for i in range(n - 1)):
                continue
            if max(combo) - min(combo) + 1 - n <= slop:
                out.add(d)
                break
    return out


@pytest.mark.parametrize(
    "terms,slop,in_order",
    [
        (["hash", "join"], 0, True),
        (["hash", "join"], 2, True),
        (["join", "hash"], 1, False),
        (["hash", "join", "scan"], 3, True),
        (["hash", "join", "scan"], 2, False),
        (["hash", "hash"], 1, False),  # repeated clause: distinct positions
    ],
)
def test_span_near_differential(span_corpus, terms, slop, in_order):
    texts, idx = span_corpus
    got = {r["doc_id"] for r in span_near_docs(idx, terms, slop, in_order).collect()}
    want = _brute_near(texts, terms, slop, in_order)
    assert got == want


def test_span_first(span_corpus):
    texts, idx = span_corpus
    got = {r["doc_id"] for r in span_first_docs(idx, "sort", end=2).collect()}
    want = {d for d, t in enumerate(texts) if "sort" in t.split(" ")[:2]}
    assert got == want
