"""FuzzySuggester analog vs a python brute-force oracle (prefix within
Damerau-Levenshtein distance, non-fuzzy first char, min fuzzy
length)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.functions.editdist import damerau_levenshtein
from lucene_spark.index import InvertedIndex
from lucene_spark.search.suggest import fuzzy_suggest

VOCAB = [
    "query", "quart", "quick", "quest", "queue", "qubit",
    "merge", "marge", "mergz", "spark", "spars", "sparse",
]


@pytest.fixture(scope="module")
def idx(spark):
    rng = np.random.RandomState(13)
    texts = [
        " ".join(rng.choice(VOCAB, size=rng.randint(2, 12))) for _ in range(100)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return (
        texts,
        InvertedIndex.build(docs, analyzer="simple", docs_per_segment=32),
    )


def _brute(texts, key, n, max_edits, non_fuzzy_prefix=1, min_fuzzy_length=3):
    vocab = {}
    for t in texts:
        for w in set(t.split(" ")):
            vocab[w] = vocab.get(w, 0) + 1
    out = []
    for term, df in vocab.items():
        if len(key) < min_fuzzy_length:
            if term.startswith(key):
                out.append((term, df))
            continue
        if term[:non_fuzzy_prefix] != key[:non_fuzzy_prefix]:
            continue
        hit = any(
            damerau_levenshtein(term[:plen], key) <= max_edits
            for plen in range(
                max(non_fuzzy_prefix, len(key) - max_edits),
                min(len(term), len(key) + max_edits) + 1,
            )
        )
        if hit:
            out.append((term, df))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:n]


@pytest.mark.parametrize("key,me", [("quary", 1), ("quary", 2), ("mrge", 1), ("spak", 1)])
def test_fuzzy_suggest_matches_brute(idx, key, me):
    texts, index = idx
    got = [
        (r["term"], r["weight"])
        for r in fuzzy_suggest(index, key, n=8, max_edits=me).collect()
    ]
    assert got == _brute(texts, key, 8, me)


def test_short_key_falls_back_to_exact_prefix(idx):
    texts, index = idx
    got = [
        (r["term"], r["weight"])
        for r in fuzzy_suggest(index, "qu", n=10, max_edits=2).collect()
    ]
    assert got == _brute(texts, "qu", 10, 2)
    assert all(t.startswith("qu") for t, _ in got)
