"""General span algebra (SpanOr / SpanNear-over-spans /
SpanContaining / SpanWithin) vs brute-force position oracles on a
randomized corpus, plus differential checks against the width-1 span
paths and the intervals implementation where semantics coincide."""

import os
import sys
from itertools import product

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.index import InvertedIndex
from lucene_spark.search.spans import (
    span_containing_docs,
    span_near_docs,
    span_near_over,
    span_or,
    span_or_docs,
    span_within_docs,
    term_or_spans,
    term_spans,
)

VOCAB = ["hash", "join", "scan", "sort", "merge", "x", "y"]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(23)
    texts = [
        " ".join(rng.choice(VOCAB, size=rng.randint(2, 15))) for _ in range(90)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    idx = InvertedIndex.build(
        docs, analyzer="simple", docs_per_segment=16, positions=True
    )
    return texts, idx


def _positions(toks, words):
    return [i for i, t in enumerate(toks) if t in words]


def _brute_or_near_ordered(texts, or_words, second, slop):
    """ordered near([SpanOr(or_words), second], slop) over width-1 spans."""
    out = set()
    for d, t in enumerate(texts):
        toks = t.split(" ")
        p1 = _positions(toks, or_words)
        p2 = _positions(toks, {second})
        for i, j in product(p1, p2):
            # ordered general spans: e1 <= s2 and gap = s2 - e1 <= slop
            if j >= i + 1 and (j - (i + 1)) <= slop:
                out.add(d)
                break
    return out


def _docs(df):
    return {r["doc_id"] for r in df.collect()}


def test_span_or_docs_union(corpus):
    texts, idx = corpus
    got = _docs(
        span_or_docs(idx, [term_spans(idx, "hash"), term_spans(idx, "scan")])
    )
    want = {
        d for d, t in enumerate(texts) if set(t.split(" ")) & {"hash", "scan"}
    }
    assert got == want


@pytest.mark.parametrize("slop", [0, 1, 3])
def test_span_or_inside_near_ordered(corpus, slop):
    texts, idx = corpus
    frames = [term_or_spans(idx, ["hash", "merge"]), term_or_spans(idx, ["join"])]
    got = _docs(span_near_over(frames, slop=slop, in_order=True).select("doc_id"))
    want = _brute_or_near_ordered(texts, {"hash", "merge"}, "join", slop)
    assert got == want


@pytest.mark.parametrize(
    "terms,slop,in_order",
    [
        (["hash", "join"], 2, True),
        (["join", "hash"], 1, False),
        (["hash", "join", "scan"], 3, True),
    ],
)
def test_near_over_width1_matches_span_near_docs(corpus, terms, slop, in_order):
    """span_near_over on width-1 term spans ≡ the dedicated width-1
    path (same Lucene semantics, two implementations)."""
    _, idx = corpus
    frames = [term_spans(idx, t) for t in terms]
    got = _docs(span_near_over(frames, slop, in_order).select("doc_id"))
    want = _docs(span_near_docs(idx, terms, slop, in_order))
    assert got == want


def _brute_containing(texts, w1, w2, slop, little):
    """docs where an ordered (w1..w2, slop) window contains `little`."""
    out = set()
    for d, t in enumerate(texts):
        toks = t.split(" ")
        p1 = _positions(toks, {w1})
        p2 = _positions(toks, {w2})
        pm = _positions(toks, {little})
        for i, j in product(p1, p2):
            if j >= i + 1 and (j - (i + 1)) <= slop:
                # window [i, j+1); little span [m, m+1)
                if any(i <= m and m + 1 <= j + 1 for m in pm):
                    out.add(d)
                    break
    return out


@pytest.mark.parametrize("slop", [1, 3, 5])
def test_span_containing(corpus, slop):
    texts, idx = corpus
    big = span_near_over(
        [term_spans(idx, "hash"), term_spans(idx, "join")], slop, in_order=True
    )
    little = term_spans(idx, "merge")
    got = _docs(span_containing_docs(idx, big, little))
    assert got == _brute_containing(texts, "hash", "join", slop, "merge")


@pytest.mark.parametrize("slop", [1, 3])
def test_span_within_doc_set_equals_containing(corpus, slop):
    """SpanWithin enumerates little's spans, SpanContaining big's —
    the DISTINCT doc sets coincide (both require a containing pair)."""
    _, idx = corpus
    big = span_near_over(
        [term_spans(idx, "hash"), term_spans(idx, "join")], slop, in_order=True
    )
    little = term_spans(idx, "merge")
    assert _docs(span_within_docs(idx, big, little)) == _docs(
        span_containing_docs(idx, big, little)
    )


def test_span_or_dedups_shared_spans(corpus):
    """a term in both clauses yields each span once."""
    _, idx = corpus
    u = span_or([term_spans(idx, "hash"), term_or_spans(idx, ["hash", "scan"])])
    plain = span_or([term_or_spans(idx, ["hash", "scan"])])
    assert sorted(map(tuple, u.collect())) == sorted(map(tuple, plain.collect()))


def test_field_masking_cross_index(spark):
    """FieldMaskingSpanQuery analog: span frames from two different
    single-field indexes (same doc ids) compose in one SpanNear —
    positions are compared as if one field, the reference's semantics
    (`queries/spans/FieldMaskingSpanQuery.java:59-77`)."""
    rows = [
        (0, "hash join scan", "merge sort scan"),
        (1, "scan hash x y", "x merge y z"),
        (2, "x y hash z", "merge x y z"),
        (3, "join x y z", "x y merge z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, f1 string, f2 string")
    idx1 = InvertedIndex.build(
        docs.select("doc_id", F.col("f1").alias("text")),
        analyzer="simple", docs_per_segment=4, positions=True,
    )
    idx2 = InvertedIndex.build(
        docs.select("doc_id", F.col("f2").alias("text")),
        analyzer="simple", docs_per_segment=4, positions=True,
    )
    # near(ordered, slop=1): 'hash' in f1 followed by 'merge' AS IF f1
    got = {
        r["doc_id"]
        for r in span_near_over(
            [term_spans(idx1, "hash"), term_spans(idx2, "merge")],
            slop=1,
            in_order=True,
        ).collect()
    }
    want = set()
    for d, f1, f2 in rows:
        p1 = [i for i, t in enumerate(f1.split(" ")) if t == "hash"]
        p2 = [i for i, t in enumerate(f2.split(" ")) if t == "merge"]
        if any(j >= i + 1 and j - i - 1 <= 1 for i in p1 for j in p2):
            want.add(d)
    assert got == want


def test_near_over_unordered_general_spans(corpus):
    """unordered near over a 2-wide span and a term: covering width
    minus total length <= slop (NearSpansUnordered.atMatch — overlap
    permitted, though 'scan' can never sit inside a hash-join window
    here)."""
    texts, idx = corpus
    big = span_near_over(
        [term_spans(idx, "hash"), term_spans(idx, "join")], 0, in_order=True
    )  # exact adjacent "hash join" windows, width 2
    got = _docs(
        span_near_over([big, term_spans(idx, "scan")], slop=1, in_order=False)
        .select("doc_id")
    )
    want = set()
    for d, t in enumerate(texts):
        toks = t.split(" ")
        ph = [
            i
            for i in range(len(toks) - 1)
            if toks[i] == "hash" and toks[i + 1] == "join"
        ]
        ps = _positions(toks, {"scan"})
        for i, m in product(ph, ps):
            # spans [i, i+2) and [m, m+1): width rule only (overlap ok)
            lo, hi = min(i, m), max(i + 2, m + 1)
            if (hi - lo) - 3 <= 1:
                want.add(d)
                break
    assert got == want
