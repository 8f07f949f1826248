"""Blended-fuzzy scoring (TopTermsBlendedFreqScoringRewrite) parity."""

import duckdb
import pandas as pd
import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search.parity import blended_fuzzy_f64, oracle_blended_fuzzy_sql

_DOCS = [
    (0, "query query data"),
    (1, "quern stone mill"),
    (2, "query quern tools"),
    (3, "nothing here"),
    (4, "quer quer quer quer"),
    (5, "queue is different"),
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    return InvertedIndex.build(docs, analyzer="simple", docs_per_segment=4)


def test_blended_fuzzy_matches_oracle(index):
    got = [
        (r["doc_id"], r["score"])
        for r in blended_fuzzy_f64(index, "quer", max_edits=1, k=10).collect()
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(_DOCS, columns=["doc_id", "text"]))
    want = [
        (d, pytest.approx(s, abs=1e-4))
        for d, s in con.execute(
            oracle_blended_fuzzy_sql("quer", max_edits=1, k=10)
        ).fetchall()
    ]
    assert got == want
    # 'queue' is Damerau distance 2 from 'quer' -> doc 5 must not match
    assert 5 not in {d for d, _ in got}
    assert 3 not in {d for d, _ in got}


def test_blended_df_flattens_rarity(index):
    """Blending uses ONE df (the max) for every expansion, so a rare
    variant ('quern', df=2) scores with the common df — its idf no
    longer dominates, which is the point of blending."""
    rows = {r["doc_id"]: r["score"] for r in blended_fuzzy_f64(index, "quer", 1, 10).collect()}
    # doc 4 (freq 4 of the exact rare term) must beat doc 1 (freq 1)
    assert rows[4] > rows[1]


def test_blended_fuzzy_no_expansion(index):
    assert blended_fuzzy_f64(index, "zzzzzzzz", 1, 5).count() == 0
