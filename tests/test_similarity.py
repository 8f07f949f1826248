"""Pluggable similarity invariants + engine integration.

Property battery modeled on the reference's BaseSimilarityTestCase
(`test-framework/.../search/similarities/BaseSimilarityTestCase.java`):
over a grid of (freq, dl, df, ttf) stats every similarity must produce
finite, non-negative scores that are monotone non-decreasing in freq
and non-increasing in doc length (Boolean is flat, which satisfies
both weakly). Integration: similarity_topk_f64 under BM25Similarity
must reproduce the existing BM25 parity path bit-for-bit.
"""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search.parity import bm25_topk_f64, similarity_topk_f64
from lucene_spark.search.similarity import (
    AxiomaticF2EXP,
    BM25Similarity,
    BooleanSimilarity,
    ClassicSimilarity,
    DFIChiSquared,
    DFRInL2Similarity,
    ExpressionSimilarity,
    IBLLSimilarity,
    LMDirichletSimilarity,
    LMJelinekMercerSimilarity,
)

SIMS = [
    BM25Similarity(),
    ClassicSimilarity(),
    BooleanSimilarity(),
    LMDirichletSimilarity(),
    LMJelinekMercerSimilarity(),
    DFRInL2Similarity(),
    AxiomaticF2EXP(),
    DFIChiSquared(),
    IBLLSimilarity(),
]

N_DOCS, STTF = 1000.0, 25000.0  # collection stats for the grid


def _scores(spark, sim, rows):
    df = spark.createDataFrame(
        rows, "freq double, dl double, doc_freq double, ttf double"
    )
    cols = {
        "freq": F.col("freq"),
        "dl": F.col("dl"),
        "doc_freq": F.col("doc_freq"),
        "ttf": F.col("ttf"),
        "n_docs": F.lit(N_DOCS),
        "sttf": F.lit(STTF),
        "boost": F.lit(1.0),
    }
    return [
        r["s"]
        for r in df.select(sim.score_col(cols).alias("s"), "freq", "dl").collect()
    ]


GRID = [
    (float(freq), float(dl), float(df), float(ttf))
    for freq, dl in itertools.product([1, 2, 5, 20, 100], [1, 5, 24, 100, 500])
    for df, ttf in [(1.0, 2.0), (10.0, 50.0), (500.0, 5000.0)]
    if freq <= dl and ttf >= df
]


@pytest.mark.parametrize("sim", SIMS, ids=lambda s: type(s).__name__)
def test_finite_nonnegative(spark, sim):
    for s in _scores(spark, sim, GRID):
        assert math.isfinite(s), s
        assert s >= 0.0, s


@pytest.mark.parametrize("sim", SIMS, ids=lambda s: type(s).__name__)
def test_monotone_in_freq(spark, sim):
    base = [(f, 500.0, 10.0, 50.0) for f in [1.0, 2.0, 4.0, 8.0, 64.0, 400.0]]
    scores = _scores(spark, sim, base)
    for a, b in zip(scores, scores[1:]):
        assert b >= a - 1e-12, (a, b)


@pytest.mark.parametrize("sim", SIMS, ids=lambda s: type(s).__name__)
def test_monotone_in_length(spark, sim):
    base = [(5.0, dl, 10.0, 50.0) for dl in [5.0, 10.0, 40.0, 160.0, 640.0]]
    scores = _scores(spark, sim, base)
    for a, b in zip(scores, scores[1:]):
        assert b <= a + 1e-12, (a, b)


def test_idf_decreasing_in_docfreq(spark):
    for sim in [BM25Similarity(), ClassicSimilarity(), DFRInL2Similarity(), AxiomaticF2EXP()]:
        base = [(5.0, 50.0, df, df * 3.0) for df in [1.0, 10.0, 100.0, 900.0]]
        scores = _scores(spark, sim, base)
        for a, b in zip(scores, scores[1:]):
            assert b <= a + 1e-12, (type(sim).__name__, a, b)


@pytest.fixture(scope="module")
def index(spark, documents):
    return InvertedIndex.build(documents, analyzer="simple", docs_per_segment=256)


def test_bm25_similarity_matches_parity_path(index):
    boosts = {"hash": 1.0, "join": 2.0}
    via_sim = similarity_topk_f64(index, boosts, BM25Similarity(), k=25).collect()
    via_bm25 = bm25_topk_f64(index, boosts, k=25).collect()
    assert [(r["doc_id"], r["score"]) for r in via_sim] == [
        (r["doc_id"], r["score"]) for r in via_bm25
    ]


def test_expression_similarity_plugs_in(index):
    # a user formula: pure tf / (tf + 1), no idf
    sim = ExpressionSimilarity(
        fn=lambda c: c["boost"] * c["freq"] / (c["freq"] + F.lit(1.0))
    )
    rows = similarity_topk_f64(index, {"hash": 1.0}, sim, k=10).collect()
    assert rows and all(0.0 <= r["score"] <= 1.0 for r in rows)


def test_boolean_similarity_constant_scores(index):
    rows = similarity_topk_f64(index, {"hash": 2.0}, BooleanSimilarity(), k=10).collect()
    assert rows and all(r["score"] == 2.0 for r in rows)


def test_sweetspot_plateau_tf_floor_and_classic_degeneration(spark):
    from lucene_spark.search.similarity import SweetSpotSimilarity

    sim = SweetSpotSimilarity(
        tf_min=2.0, tf_base=1.5, ln_min=20, ln_max=40, steepness=0.5
    )
    # length-norm plateau: every dl inside [ln_min, ln_max] scores equal
    plateau = _scores(spark, sim, [(5.0, dl, 10.0, 50.0) for dl in [20.0, 30.0, 40.0]])
    assert plateau[0] == pytest.approx(plateau[1], rel=1e-12)
    assert plateau[1] == pytest.approx(plateau[2], rel=1e-12)
    # outside the plateau the norm decays on BOTH sides
    below, above = _scores(
        spark, sim, [(5.0, 5.0, 10.0, 50.0), (5.0, 200.0, 10.0, 50.0)]
    )
    assert below < plateau[0] and above < plateau[0]
    # baseline tf floor: freq <= tf_min all score tf_base, then rise
    f1, f2, f3 = _scores(
        spark, sim, [(f, 30.0, 10.0, 50.0) for f in [1.0, 2.0, 3.0]]
    )
    assert f1 == pytest.approx(f2, rel=1e-12)
    assert f3 > f2
    # finite + monotone-in-freq like the rest of the family
    for s in _scores(spark, sim, GRID):
        assert math.isfinite(s) and s >= 0.0
    # defaults degrade exactly to ClassicSimilarity (sqrt tf, 1/sqrt dl)
    a = _scores(spark, SweetSpotSimilarity(), GRID[:12])
    b = _scores(spark, ClassicSimilarity(), GRID[:12])
    for x, y in zip(a, b):
        assert x == pytest.approx(y, rel=1e-12)
