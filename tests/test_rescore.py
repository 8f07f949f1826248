"""QueryRescorer / FeatureField parity: engine vs DuckDB oracle on a
hand-built corpus, plus doc_range block-pruning equivalence.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.search.parity import oracle_feature_sql, oracle_rescore_sql
from lucene_spark.search.positional import phrase_freqs
from lucene_spark.search.rescore import (
    feature_bm25_topk,
    log_feature,
    rescore_phrase_topk,
    saturation,
    sigmoid,
)

_DOCS = [
    # doc 3 has the best phrase density; doc 0 has high term freq but
    # no adjacency — rescoring must reorder them
    (0, "hash hash hash join join join sort"),
    (1, "hash join merge sort scan"),
    (2, "join hash join hash sort"),
    (3, "hash join hash join hash join"),
    (4, "merge sort scan filter group"),
    (5, "hash sort join merge hash scan"),
    (6, "sort merge sort merge sort"),
    (7, "hash join"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        [(i, t, len(t)) for i, t in _DOCS], ["doc_id", "text", "n_chars"]
    )
    return df.cache()


@pytest.fixture(scope="module")
def index(corpus):
    return InvertedIndex.build(
        corpus, analyzer="simple", docs_per_segment=4, positions=True
    )


def _oracle(sql):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            [(i, t, len(t)) for i, t in _DOCS],
            columns=["doc_id", "text", "n_chars"],
        ),
    )
    return con.execute(sql).fetchall()


def test_rescore_matches_oracle(index):
    got = [
        (r["doc_id"], r["score"])
        for r in rescore_phrase_topk(
            index, {"hash": 1.0, "join": 1.0}, ["hash", "join"],
            window=6, weight=2.0, k=6,
        ).collect()
    ]
    want = [
        (d, pytest.approx(s, abs=1e-4))
        for d, s in _oracle(
            oracle_rescore_sql(
                {"hash": 1.0, "join": 1.0}, ["hash", "join"],
                window=6, weight=2.0, k=6,
            )
        )
    ]
    assert got == want


def test_rescore_reorders_by_phrase(index):
    first = [
        r["doc_id"]
        for r in rescore_phrase_topk(
            index, {"hash": 1.0, "join": 1.0}, ["hash", "join"],
            window=8, weight=0.0, k=3,
        ).collect()
    ]
    rescored = [
        r["doc_id"]
        for r in rescore_phrase_topk(
            index, {"hash": 1.0, "join": 1.0}, ["hash", "join"],
            window=8, weight=5.0, k=3,
        ).collect()
    ]
    # weight 0 == first-pass order; a strong phrase weight must
    # promote the phrase-dense doc 3 to the top
    assert rescored[0] == 3
    assert first != rescored or first[0] == 3


def test_rescore_unindexed_phrase_term_keeps_first_pass(index):
    got = rescore_phrase_topk(
        index, {"hash": 1.0}, ["hash", "zzz"], window=5, weight=9.0, k=5
    ).collect()
    assert len(got) == 5  # window survives, no phrase contribution
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_phrase_freqs_doc_range_equivalence(index):
    full = {
        (r["doc_id"], r["freq"])
        for r in phrase_freqs(index, ["hash", "join"]).collect()
        if 2 <= r["doc_id"] <= 5
    }
    pruned = {
        (r["doc_id"], r["freq"])
        for r in phrase_freqs(index, ["hash", "join"], doc_range=(2, 5)).collect()
    }
    assert pruned == full and pruned


def test_feature_saturation_matches_oracle(index, corpus):
    got = [
        (r["doc_id"], r["score"])
        for r in feature_bm25_topk(
            index,
            {"merge": 1.0, "sort": 1.0},
            corpus.select("doc_id", "n_chars"),
            saturation(F.col("n_chars"), 20.0),
            weight=0.5,
            k=6,
        ).collect()
    ]
    want = [
        (d, pytest.approx(s, abs=1e-4))
        for d, s in _oracle(
            oracle_feature_sql(
                {"merge": 1.0, "sort": 1.0},
                "n_chars / (n_chars + 20.0)",
                weight=0.5,
                k=6,
            )
        )
    ]
    assert got == want


def test_feature_functions_math(spark):
    row = (
        spark.createDataFrame([(8.0,)], ["v"])
        .select(
            saturation(F.col("v"), 2.0).alias("sat"),
            log_feature(F.col("v"), 1.0).alias("lg"),
            sigmoid(F.col("v"), 2.0, 2.0).alias("sg"),
        )
        .collect()[0]
    )
    assert row["sat"] == pytest.approx(8.0 / 10.0)
    assert row["lg"] == pytest.approx(__import__("math").log(9.0))
    assert row["sg"] == pytest.approx(64.0 / 68.0)
