"""IVF-PQ product quantization (Jegou et al., TPAMI 2011; the
``IVF{n},PQ{m}`` leg of the faiss index-factory strings,
`sandbox/codecs/faiss/FaissKnnVectorsFormat.java:59`).

Exactness regime (generous refine + all probes) must reproduce the
brute-force cosine top-k; the tight-budget regime is recall-tested.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_pq_topk,
    pq_encode,
    pq_topk,
    pq_train,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]


def test_pq_train_shape_and_determinism(emb):
    b1 = pq_train(emb, m=8, ksub=16, seed=7)
    b2 = pq_train(emb, m=8, ksub=16, seed=7)
    assert b1.shape == (8, 16, 8) and b1.dtype == np.float32
    assert np.array_equal(b1, b2)


def test_pq_train_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError):
        pq_train(emb, m=7)


def test_pq_encode_m_bytes_per_vector(emb):
    books = pq_train(emb, m=8, ksub=16, seed=7)
    coded = pq_encode(emb, books)
    lens = coded.select(F.length("pq_code").alias("n")).distinct().collect()
    assert [r.n for r in lens] == [8]


def test_pq_exact_regime_matches_brute_force(emb, qvec):
    books = pq_train(emb, m=8, ksub=32, seed=7)
    coded = pq_encode(emb, books)
    got = [
        (r.vec_id, r.cos)
        for r in pq_topk(coded, books, qvec, k=10, refine=20).collect()
    ]
    want = [(r.vec_id, r.cos) for r in cosine_topk(emb, qvec, k=10).collect()]
    assert got == want


def test_ivf_pq_recall_tight_budget(emb, qvec):
    assigned, cent = ivf_assign(emb, n_lists=8, seed=7)
    books = pq_train(emb, m=8, ksub=32, seed=7)
    coded = pq_encode(assigned, books)
    approx = {
        r.vec_id
        for r in ivf_pq_topk(
            coded, cent, books, qvec, k=10, n_probes=4, refine=3
        ).collect()
    }
    exact = {r.vec_id for r in cosine_topk(emb, qvec, k=10).collect()}
    assert len(approx & exact) / 10 >= 0.8


def test_ivf_pq_full_probe_generous_refine_exact(emb, qvec):
    assigned, cent = ivf_assign(emb, n_lists=8, seed=7)
    books = pq_train(emb, m=8, ksub=32, seed=7)
    coded = pq_encode(assigned, books)
    got = [
        (r.vec_id, r.cos)
        for r in ivf_pq_topk(
            coded, cent, books, qvec, k=10, n_probes=8, refine=20
        ).collect()
    ]
    want = [(r.vec_id, r.cos) for r in cosine_topk(emb, qvec, k=10).collect()]
    assert got == want
