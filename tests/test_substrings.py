"""Exact-substring duplication signals: gram enumeration, cross-doc
repeats, per-doc duplicated-start fraction, hash-key parity."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.substrings import (
    duplicated_span_starts,
    duplicated_spans,
    ngram_spans,
    repeated_ngrams,
)

_DOCS = [
    (0, "a b c d e f"),          # shares "a b c d" with doc 1
    (1, "a b c d x y"),
    (2, "p q r s"),              # exactly 4 tokens → one 4-gram
    (3, "short doc"),            # < n tokens → no grams
    (4, "p q r s"),              # exact duplicate of doc 2
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, ["doc_id", "text"]).cache()


def test_ngram_spans_enumeration(docs):
    rows = {
        (r["doc_id"], r["pos"], r["gram"])
        for r in ngram_spans(docs, n=4).collect()
    }
    assert (0, 0, "a b c d") in rows and (0, 2, "c d e f") in rows
    assert (2, 0, "p q r s") in rows and (4, 0, "p q r s") in rows
    assert not any(d == 3 for d, _, _ in rows)  # too short
    assert sum(1 for d, _, _ in rows if d == 0) == 3  # 6 - 4 + 1


def test_repeated_ngrams(docs):
    got = {
        r["gram"]: (r["n_docs"], r["n_occurrences"])
        for r in repeated_ngrams(docs, n=4, min_docs=2).collect()
    }
    assert got == {"a b c d": (2, 2), "p q r s": (2, 2)}


def test_duplicated_span_starts(docs):
    got = {
        r["doc_id"]: (r["total_grams"], r["dup_starts"], r["dup_frac"])
        for r in duplicated_span_starts(docs, n=4, min_docs=2).collect()
    }
    assert got[2] == (1, 1, 1.0) and got[4] == (1, 1, 1.0)
    assert got[0] == (3, 1, pytest.approx(0.333333))
    assert got[1] == (3, 1, pytest.approx(0.333333))
    assert 3 not in got  # no grams at all


def test_duplicated_spans_basic(docs):
    got = {
        r["doc_id"]: (
            r["total_tokens"], r["n_spans"], r["covered_tokens"], r["coverage"]
        )
        for r in duplicated_spans(docs, n=4, min_docs=2).collect()
    }
    # doc 0: one dup gram at pos 0 -> span [0,4), 4 of 6 tokens
    assert got[0] == (6, 1, 4, pytest.approx(0.666667))
    assert got[1] == (6, 1, 4, pytest.approx(0.666667))
    assert got[2] == (4, 1, 4, 1.0) and got[4] == (4, 1, 4, 1.0)
    assert 3 not in got  # < n tokens


def test_duplicated_spans_merge(spark):
    """Overlapping dup starts merge into one maximal span; a gap > n
    starts a new one (Lee et al. union-of-windows semantics)."""
    rows = [
        (10, "x1 x2 x3 x4 x5 junkA y1 y2 y3 y4"),
        (11, "x1 x2 x3 x4 x5 junkB y1 y2 y3 y4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["total_tokens"], r["n_spans"], r["covered_tokens"], r["coverage"]
        )
        for r in duplicated_spans(df, n=4, min_docs=2).collect()
    }
    # dup starts {0, 1, 6}: [0,4)+[1,5) merge to [0,5); [6,10) separate
    assert got[10] == (10, 2, 9, pytest.approx(0.9))
    assert got[11] == (10, 2, 9, pytest.approx(0.9))


def test_hash_key_parity(docs):
    plain = repeated_ngrams(docs, n=4, min_docs=2).count()
    hashed = repeated_ngrams(docs, n=4, min_docs=2, as_hash=True).count()
    assert plain == hashed
    g = ngram_spans(docs, n=4, as_hash=True).schema["gram"].dataType.simpleString()
    assert g == "bigint"
