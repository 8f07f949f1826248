"""Search-quality metrics (benchmark/quality/QualityStats.java analog)
against hand-computed values."""

import pytest

from lucene_spark.search.quality import mean_quality, quality_stats


def _frames(spark):
    run = spark.createDataFrame(
        [("q1", d, 6.0 - d) for d in (1, 2, 3, 4, 5)]
        + [("q2", d, 10.0 - d) for d in (1, 2, 3)],
        "query_id string, doc_id int, score double",
    )
    judg = spark.createDataFrame(
        [("q1", 2, 1), ("q1", 4, 2), ("q1", 9, 1),
         ("q2", 7, 1)],
        "query_id string, doc_id int, grade int",
    )
    return run, judg


def test_per_query_metrics(spark):
    run, judg = _frames(spark)
    out = {r.query_id: r for r in quality_stats(run, judg, k=5).collect()}

    q1 = out["q1"]
    assert q1.p_at_k == pytest.approx(0.4)
    assert q1.recall_at_k == pytest.approx(2 / 3, abs=1e-5)
    # AP = (P@2 + P@4) / max_good = (0.5 + 0.5) / 3
    assert q1.ap == pytest.approx(1 / 3, abs=1e-5)
    assert q1.mrr == pytest.approx(0.5)
    dcg = 1 / 1.5849625 + 2 / 2.3219281
    idcg = 2 / 1.0 + 1 / 1.5849625 + 1 / 2.0
    assert q1.ndcg_at_k == pytest.approx(dcg / idcg, abs=1e-5)

    # q2 retrieved nothing relevant
    q2 = out["q2"]
    assert q2.p_at_k == 0.0
    assert q2.ap == 0.0
    assert q2.mrr == 0.0
    assert q2.ndcg_at_k == 0.0


def test_mrr_window_quirk(spark):
    # QualityStats.java:88: reciprocal rank only when the first
    # relevant hit is within the top-5 window
    run = spark.createDataFrame(
        [("q", d, 100.0 - d) for d in range(1, 11)],
        "query_id string, doc_id int, score double",
    )
    judg = spark.createDataFrame(
        [("q", 6, 1)], "query_id string, doc_id int, grade int"
    )
    r = quality_stats(run, judg, k=10).collect()[0]
    assert r.mrr == 0.0  # first relevant at rank 6 > window 5
    r2 = quality_stats(run, judg, k=10, mrr_window=10).collect()[0]
    assert r2.mrr == pytest.approx(1 / 6, abs=1e-5)


def test_mean_quality(spark):
    run, judg = _frames(spark)
    m = mean_quality(quality_stats(run, judg, k=5)).collect()[0]
    assert m.n_queries == 2
    assert m.map == pytest.approx((1 / 3 + 0.0) / 2, abs=1e-5)
    assert m.mean_mrr == pytest.approx(0.25, abs=1e-6)
