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
            if in_order:
                # ordered: strictly increasing, non-overlapping
                if any(combo[i] >= combo[i + 1] for i in range(n - 1)):
                    continue
            # unordered: overlap permitted (NearSpansUnordered.atMatch
            # checks only the covering-width arithmetic)
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
        (["hash", "hash"], 1, False),  # repeated clause: overlap matches
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


# --- NGramPhrase / RegExp / filtered KNN (round-2 additions) ---------------


def test_lucene_regexp_translation():
    from lucene_spark.search.query import lucene_regexp_to_java
    import re

    assert re.fullmatch(lucene_regexp_to_java("ab@"), "abxyz")
    assert re.fullmatch(lucene_regexp_to_java("a<1-12>b"), "a7b")
    assert re.fullmatch(lucene_regexp_to_java("a<1-12>b"), "a12b")
    assert not re.fullmatch(lucene_regexp_to_java("a<1-12>b"), "a13b")
    assert not re.fullmatch(lucene_regexp_to_java("#"), "")
    with pytest.raises(NotImplementedError):
        lucene_regexp_to_java("~ab")
    # escapes pass through
    assert re.fullmatch(lucene_regexp_to_java(r"a\.b"), "a.b")
    assert not re.fullmatch(lucene_regexp_to_java(r"a\.b"), "axb")


def test_ngram_phrase_equals_full_phrase(spark):
    from lucene_spark.search.positional import ngram_phrase_docs, phrase_freqs
    from pyspark.sql import functions as F

    texts = ["the vector engine", "no match", "vectors everywhere", "vec tor split"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    t = F.translate(F.col("text"), " ", "_")
    gram_text = F.array_join(
        F.transform(F.sequence(F.lit(1), F.length(t) - 2), lambda i: t.substr(i, F.lit(3))),
        " ",
    )
    grams_df = docs.select("doc_id", gram_text.alias("text"))
    idx = InvertedIndex.build(grams_df, analyzer="simple", docs_per_segment=4, positions=True)
    word = "vector"
    grams = [word[i : i + 3] for i in range(len(word) - 2)]
    fast = {r["doc_id"] for r in ngram_phrase_docs(idx, grams, n=3).collect()}
    full = {r["doc_id"] for r in phrase_freqs(idx, grams, slop=0).collect()}
    want = {i for i, x in enumerate(texts) if "vector" in x}
    assert fast == full == want  # doc 3 has 'vec_tor' grams, must NOT match


def test_filtered_knn_restricts_candidates(spark):
    import numpy as np
    import pandas as pd

    from lucene_spark.index import InvertedIndex
    from lucene_spark.search import TermQuery
    from lucene_spark.search.knn import knn_filtered_topk

    docs = spark.createDataFrame(
        [(i, "red apple" if i % 2 == 0 else "blue sky") for i in range(40)],
        "doc_id long, text string",
    )
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=16)
    rng = np.random.RandomState(5)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(40),
                "embedding": [rng.standard_normal(8).tolist() for _ in range(40)],
            }
        )
    )
    q = [1.0] * 8
    hits = knn_filtered_topk(idx, emb, q, TermQuery("apple"), k=10).collect()
    assert len(hits) == 10
    assert all(r["vec_id"] % 2 == 0 for r in hits)  # filter respected
    # scores descending, ties by id
    cos = [r["cos"] for r in hits]
    assert cos == sorted(cos, reverse=True)


# --- SpanNotQuery ----------------------------------------------------------


def test_span_not(spark):
    import pandas as pd

    from lucene_spark.index import InvertedIndex
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import SpanNearQuery, SpanNotQuery
    from lucene_spark.search.spans import span_not_docs

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(5),
                "text": [
                    "hash join slow",      # include at [0,2), no fast
                    "fast hash join",      # fast 1 token before -> pre=1 kills
                    "hash join fast",      # fast right after -> post=1 kills
                    "hash join x fast",    # fast outside the widened window
                    "hash fast join",      # no adjacent include match
                ],
            }
        )
    )
    idx = InvertedIndex.build(
        docs, analyzer="simple", docs_per_segment=8, positions=True
    )
    slots = [["hash"], ["join"]]
    base = sorted(
        r["doc_id"] for r in span_not_docs(idx, slots, ["fast"]).collect()
    )
    assert base == [0, 1, 2, 3]  # zero-width exclusion never overlaps
    tight = sorted(
        r["doc_id"]
        for r in span_not_docs(idx, slots, ["fast"], pre=1, post=1).collect()
    )
    assert tight == [0, 3]
    # through the query node + searcher
    q = SpanNotQuery(
        include=SpanNearQuery(("hash", "join"), slop=0, in_order=True),
        exclude_terms=("fast",),
        pre=1,
        post=1,
    )
    got = sorted(r["doc_id"] for r in IndexSearcher(idx).search(q, k=10).collect())
    assert got == [0, 3]


def test_span_not_xml_round_trip(spark):
    from lucene_spark.search.query import SpanNearQuery, SpanNotQuery
    from lucene_spark.search.xmlparser import xml_parse

    q = xml_parse(
        "<SpanNot pre='1' post='1'>"
        "<Include><SpanNear slopNum='0' inOrder='true'>"
        "<SpanTerm>hash</SpanTerm><SpanTerm>join</SpanTerm></SpanNear></Include>"
        "<Exclude><SpanTerm>fast</SpanTerm></Exclude></SpanNot>"
    )
    assert q == SpanNotQuery(
        include=SpanNearQuery(("hash", "join"), slop=0, in_order=True),
        exclude_terms=("fast",),
        pre=1,
        post=1,
    )
