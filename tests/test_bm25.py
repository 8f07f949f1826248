"""BM25 float32-exactness (FIXTURES.md F3) + similarity property tests.

Property battery mirrors BaseSimilarityTestCase (`test-framework/.../
similarities/BaseSimilarityTestCase.java:374-473`): scores are finite,
non-negative, bounded by the weight, monotone in freq, anti-monotone in
length.
"""

import math

import numpy as np
import pytest

from lucene_spark.functions.bm25 import BM25, bm25_cache, bm25_idf
from lucene_spark.functions.smallfloat import int_to_byte4


def test_idf_is_float32_of_double_log():
    # idf = (float) Math.log(1 + (N - n + 0.5)/(n + 0.5))
    assert bm25_idf(3, 10) == np.float32(math.log(1 + (10 - 3 + 0.5) / (3 + 0.5)))
    assert bm25_idf(1, 1) == np.float32(math.log(1 + 0.5 / 1.5))


def test_cache_evaluation_order():
    # cache[i] = 1f / (k1 * ((1-b) + b * LENGTH_TABLE[i] / avgdl)), float32
    avgdl = np.float32(7.0)
    cache = bm25_cache(avgdl)
    k1, b, one = np.float32(1.2), np.float32(0.75), np.float32(1.0)
    from lucene_spark.functions.smallfloat import LENGTH_TABLE

    for i in (0, 1, 23, 100, 255):
        expect = one / (k1 * ((one - b) + b * LENGTH_TABLE[i] / avgdl))
        assert cache[i] == expect


def test_score_rewrite_form():
    # score = weight - weight / (1 + freq * normInverse), float32 ops
    s = BM25(doc_freq=2, doc_count=8, sum_total_term_freq=40, boost=2.0)
    f = np.float32(3.0)
    nb = int(int_to_byte4(5))
    ni = s.cache[nb]
    expect = s.weight - s.weight / (np.float32(1.0) + f * ni)
    assert s.score([3], [nb])[0] == expect
    # boost folds into weight (createWeight semantics), not post-multiply
    assert s.weight == np.float32(2.0) * s.idf


def test_exact_hand_computed_fixture():
    # N=4 docs, lengths 3,5,8,11 → sttf=27, term df=2
    s = BM25(doc_freq=2, doc_count=4, sum_total_term_freq=27)
    assert s.avgdl == np.float32(27 / 4.0)
    assert s.idf == np.float32(math.log(1 + (4 - 2 + 0.5) / 2.5))
    got = float(s.score([2], [int(int_to_byte4(5))])[0])
    # manual float32 chain
    one = np.float32(1.0)
    ni = one / (np.float32(1.2) * ((one - np.float32(0.75)) + np.float32(0.75) * np.float32(5.0) / s.avgdl))
    expect = float(s.weight - s.weight / (one + np.float32(2.0) * ni))
    assert got == expect


def test_quantized_norm_buckets():
    # lengths below NUM_FREE_VALUES are exact; above are lossy but scores
    # must still be anti-monotone in the *quantized* length
    s = BM25(doc_freq=5, doc_count=100, sum_total_term_freq=5000)
    lens = [1, 10, 23, 24, 50, 200, 2000]
    scores = [float(s.score([3], [int(int_to_byte4(x))])[0]) for x in lens]
    assert all(a >= b for a, b in zip(scores, scores[1:]))


@pytest.mark.parametrize("seed", range(10))
def test_similarity_properties(seed):
    rng = np.random.RandomState(seed)
    df = int(rng.randint(1, 50))
    n = int(rng.randint(df, 200))
    sttf = int(rng.randint(n, n * 100))
    boost = float(rng.uniform(0.1, 10))
    s = BM25(doc_freq=df, doc_count=n, sum_total_term_freq=sttf, boost=boost)
    freqs = np.sort(rng.randint(1, 1000, size=20))
    norms = rng.randint(0, 256, size=20)
    scores = s.score(freqs, norms)
    assert np.all(np.isfinite(scores))
    assert np.all(scores >= 0)
    assert np.all(scores <= s.weight)  # weight is the upper bound
    # monotone in freq at fixed norm
    fixed_norm = np.full(20, 100)
    sc = s.score(freqs, fixed_norm)
    assert np.all(np.diff(sc) >= 0)
