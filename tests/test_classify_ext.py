"""BooleanPerceptronClassifier + KNearestFuzzyClassifier analogs
(`classification/BooleanPerceptronClassifier.java:60`,
`classification/KNearestFuzzyClassifier.java:46`).

The perceptron's sequential update pass is pinned by hand-traced
fixtures (including the batched-FST stale-snapshot quirk); the epoch-0
decision function and the fuzzy-kNN fold are cross-checked against
their DuckDB oracle emission.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.search.classify import (
    knn_fuzzy_classify,
    oracle_knn_fuzzy_sql,
    oracle_perceptron_sql,
    perceptron_assign,
    perceptron_init,
    perceptron_train,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": [t for t, _ in rows],
                "label": [lb for _, lb in rows],
            }
        )
    )


def test_perceptron_init_stats(spark):
    docs = _docs(spark, [("spam spam ham", False), ("ham ham", True)])
    w, bias = perceptron_init(docs)
    got = {r.term: r.w for r in w.collect()}
    assert got == {"spam": 2, "ham": 3}
    assert bias == pytest.approx(5 / 2)  # sumTotalTermFreq / docCount


def test_perceptron_train_hand_trace(spark):
    # ttf: spam=3 ham=4 good=1; bias = 8 tokens / 4 docs = 2.0
    docs = _docs(
        spark,
        [
            ("spam spam ham", False),  # output 10 >= 2 -> True, wrong:
            #   modifier -1, spam=max(0,3-2)=1, ham=max(0,4-1)=3
            ("ham ham", True),         # 3+3=6 >= 2 -> True, correct
            ("spam", False),           # 1 < 2 -> False, correct
            ("ham good", True),        # 3+1=4 >= 2 -> True, correct
        ],
    )
    w0, bias = perceptron_init(docs)
    assert bias == pytest.approx(2.0)
    trained = perceptron_train(docs, w0, bias, batch_size=1)
    got = {r.term: r.w for r in trained.collect()}
    assert got == {"spam": 1, "ham": 3, "good": 1}


def test_perceptron_batched_fst_stale_snapshot(spark):
    # batch_size=3: the d1 misclassification updates the weight MAP
    # (x: 5->6) but NOT the FST snapshot (1 % 3 != 0), so d2 is scored
    # with the stale x=5 -> correctly False -> no second update. An
    # eager implementation would see 6 >= 6, misclassify d2, and end
    # at x=5. The reference keeps x=6.
    docs = _docs(
        spark,
        [
            ("x x x y", True),  # 16 >= 6 -> True, correct (ttf x=5,y=1)
            ("x", True),        # 5 < 6 -> False, wrong: x -> 6, no FST refresh
            ("x", False),       # stale fst: 5 < 6 -> False, correct
        ],
    )
    w0, _ = perceptron_init(docs)
    trained = perceptron_train(docs, w0, bias=6.0, batch_size=3)
    got = {r.term: r.w for r in trained.collect()}
    assert got["x"] == 6


def test_perceptron_weights_clamp_at_zero(spark):
    docs = _docs(spark, [("x x x x x", False)])  # ttf x=5, bias=5
    w0, bias = perceptron_init(docs)
    # output 25 >= 5 -> True, wrong: x = max(0, 5 - 5) = 0
    trained = perceptron_train(docs, w0, bias, batch_size=1)
    assert {r.term: r.w for r in trained.collect()} == {"x": 0}


def test_perceptron_assign_matches_oracle_epoch0(documents, spark):
    docs = documents.limit(120)
    w0, bias = perceptron_init(docs)
    got = [
        (r.doc_id, r.output, r.assigned, round(r.score, 6))
        for r in perceptron_assign(docs, w0, bias)
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.register("docs120", docs.toPandas()[["doc_id", "text"]])
    want = [
        (r[0], r[1], r[2], round(r[3], 6))
        for r in con.sql(oracle_perceptron_sql(table="docs120")).fetchall()
    ]
    assert got == want and len(got) == 120


def test_perceptron_assign_empty_text_scores_zero(spark):
    docs = spark.createDataFrame(
        [(0, "x y"), (1, "")], "doc_id long, text string"
    )
    w0, _ = perceptron_init(docs)
    rows = {
        r.doc_id: (r.output, r.assigned)
        for r in perceptron_assign(docs, w0, bias=1.0).collect()
    }
    assert rows[1] == (0, False)


def test_knn_fuzzy_classify_matches_oracle(documents, spark):
    docs = documents
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=2048)
    got = [
        (r.label, round(r.score, 6))
        for r in knn_fuzzy_classify(
            idx, docs, ["merg", "jon"], k=15, max_edits=1, prefix_length=1
        ).collect()
    ]
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = [
        (r[0], round(r[1], 6))
        for r in con.sql(
            oracle_knn_fuzzy_sql(["merg", "jon"], k=15, max_edits=1, prefix_length=1)
        ).fetchall()
    ]
    assert got == want and len(got) >= 1
