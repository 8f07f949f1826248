"""Minimal-interval queries: minimality goldens, combinators, and
cross-validation against the independent span implementation."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.index import InvertedIndex
from lucene_spark.search import intervals as I
from lucene_spark.search.intervals import _eval_source
from lucene_spark.search.spans import span_near_docs


def _pos(**kw):
    return {k: np.asarray(v, dtype=np.int64) for k, v in kw.items()}


def test_minimality_golden():
    # a@[0,2], b@[5]: [0,5] contains [2,5] → only the tight one survives
    ivs = _eval_source(I.ordered(I.term("a"), I.term("b")), _pos(a=[0, 2], b=[5]))
    assert [(s, e) for s, e, _ in ivs] == [(2, 5)]


def test_ordered_requires_order():
    ivs = _eval_source(I.ordered(I.term("a"), I.term("b")), _pos(a=[7], b=[3]))
    assert ivs == []
    ivs = _eval_source(I.unordered(I.term("a"), I.term("b")), _pos(a=[7], b=[3]))
    assert [(s, e) for s, e, _ in ivs] == [(3, 7)]


def test_or_minimizes_across_branches():
    ivs = _eval_source(
        I.i_or(I.ordered(I.term("a"), I.term("b")), I.term("a")),
        _pos(a=[1], b=[4]),
    )
    # term a's [1,1] is inside ordered's [1,4] → only [1,1] survives
    assert [(s, e) for s, e, _ in ivs] == [(1, 1)]


def test_max_gaps_and_width():
    pos = _pos(a=[0], b=[4])
    src = I.ordered(I.term("a"), I.term("b"))
    assert _eval_source(I.max_gaps(2, src), pos) == []
    assert [(s, e) for s, e, _ in _eval_source(I.max_gaps(3, src), pos)] == [(0, 4)]
    assert _eval_source(I.max_width(4, src), pos) == []
    assert len(_eval_source(I.max_width(5, src), pos)) == 1


def test_gaps_track_witness_width_through_or():
    # or(phrase(b,c), d): width-2 vs width-1 branches; gaps must use the
    # actual chosen branch's token count, not a tree-level constant
    pos = _pos(a=[0], b=[2], c=[3], d=[2])
    src = I.ordered(I.term("a"), I.i_or(I.phrase("b", "c"), I.term("d")))
    ivs = _eval_source(I.max_gaps(1, src), pos)
    # witness a@0 + phrase[2,3]: width 4, tokens 3 → gaps 1 → passes;
    # witness a@0 + d@2: width 3, tokens 2 → gaps 1 → same span [0,3]/[0,2]
    spans = [(s, e) for s, e, _ in ivs]
    assert (0, 2) in spans  # the d-branch (minimal)


def test_containing_and_contained_by():
    pos = _pos(a=[0], b=[6], x=[3], y=[9])
    big = I.ordered(I.term("a"), I.term("b"))
    assert [(s, e) for s, e, _ in _eval_source(I.containing(big, I.term("x")), pos)] == [(0, 6)]
    assert _eval_source(I.containing(big, I.term("y")), pos) == []
    assert [(s, e) for s, e, _ in _eval_source(I.contained_by(I.term("x"), big), pos)] == [(3, 3)]
    assert _eval_source(I.contained_by(I.term("y"), big), pos) == []


VOCAB = ["hash", "join", "scan", "sort", "x"]


@pytest.fixture(scope="module")
def iv_index(spark):
    rng = np.random.RandomState(9)
    texts = [" ".join(rng.choice(VOCAB, size=rng.randint(2, 14))) for _ in range(70)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return InvertedIndex.build(docs, analyzer="simple", docs_per_segment=16, positions=True)


@pytest.mark.parametrize("slop,in_order", [(0, True), (2, True), (1, False), (3, False)])
def test_intervals_match_spans(iv_index, slop, in_order):
    """max_gaps(slop, ordered/unordered(a,b)) must match the SAME docs
    as the span implementation (independent code path)."""
    src = (I.ordered if in_order else I.unordered)(I.term("hash"), I.term("join"))
    got = {
        r["doc_id"]
        for r in I.interval_matches(iv_index, I.max_gaps(slop, src)).collect()
    }
    want = {
        r["doc_id"]
        for r in span_near_docs(iv_index, ["hash", "join"], slop, in_order).collect()
    }
    assert got == want


def test_interval_phrase_matches_exact_phrase(iv_index):
    from lucene_spark.search.positional import phrase_freqs

    got = {
        r["doc_id"]
        for r in I.interval_matches(iv_index, I.phrase("hash", "join")).collect()
    }
    want = {r["doc_id"] for r in phrase_freqs(iv_index, ["hash", "join"]).collect()}
    assert got == want


def test_before_after():
    ab = I.ordered(I.term("a"), I.term("b"))
    # a@0 b@2 (interval [0,2]); reference c@5
    assert [
        (s, e) for s, e, _ in _eval_source(I.before(ab, I.term("c")), _pos(a=[0], b=[2], c=[5]))
    ] == [(0, 2)]
    # c@1 lies inside/before-start → no before match
    assert _eval_source(I.before(ab, I.term("c")), _pos(a=[0], b=[2], c=[1])) == []
    # after: interval must start past the reference's end
    assert [
        (s, e) for s, e, _ in _eval_source(I.after(ab, I.term("c")), _pos(a=[3], b=[5], c=[1]))
    ] == [(3, 5)]
    assert _eval_source(I.after(ab, I.term("c")), _pos(a=[3], b=[5], c=[4])) == []


def test_overlapping():
    ab = I.ordered(I.term("a"), I.term("b"))
    ref = I.ordered(I.term("c"), I.term("d"))
    # [2,4] overlaps [4,6]
    got = _eval_source(I.overlapping(ab, ref), _pos(a=[2], b=[4], c=[4], d=[6]))
    assert [(s, e) for s, e, _ in got] == [(2, 4)]
    # disjoint → none
    assert _eval_source(I.overlapping(ab, ref), _pos(a=[0], b=[1], c=[4], d=[6])) == []


def test_not_containing_and_not_contained_by():
    ab = I.ordered(I.term("a"), I.term("b"))
    # [0,3] contains c@2 → filtered out by not_containing
    assert _eval_source(I.not_containing(ab, I.term("c")), _pos(a=[0], b=[3], c=[2])) == []
    assert [
        (s, e)
        for s, e, _ in _eval_source(
            I.not_containing(ab, I.term("c")), _pos(a=[0], b=[3], c=[9])
        )
    ] == [(0, 3)]
    # c@[1] inside big [0,3] → dropped by not_contained_by
    assert _eval_source(I.not_contained_by(I.term("c"), ab), _pos(a=[0], b=[3], c=[1])) == []
    assert [
        (s, e)
        for s, e, _ in _eval_source(
            I.not_contained_by(I.term("c"), ab), _pos(a=[0], b=[3], c=[7])
        )
    ] == [(7, 7)]


def test_extend_clamps_and_minimizes():
    got = _eval_source(I.extend(I.term("a"), 2, 1), _pos(a=[1, 3]))
    # [1,1]→[0,2] wait clamp: max(0, 1-2)=0 → [0,2]; [3,3]→[1,4]; neither nested
    assert [(s, e) for s, e, _ in got] == [(0, 2), (1, 4)]
    # nesting after extension is minimized away
    got = _eval_source(
        I.extend(I.i_or(I.term("a"), I.term("b")), 0, 2), _pos(a=[5], b=[6])
    )
    # a: [5,7], b: [6,8] — no containment, both stay
    assert [(s, e) for s, e, _ in got] == [(5, 7), (6, 8)]
    # b@5 with after=0: [5,5] inside a-extended [3,5]? extend(a,2,0): a@5 → [3,5]
    got = _eval_source(
        I.extend(I.i_or(I.term("a"), I.term("b")), 2, 0), _pos(a=[5], b=[4])
    )
    # a→[3,5], b→[2,4]: no nesting
    assert [(s, e) for s, e, _ in got] == [(2, 4), (3, 5)]
