"""Scalar-quantized (int8) HNSW: exactness at full-coverage ef, recall
vs the float32 path, quantization round-trip bounds, and the 4x
bytes-per-component storage claim."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.search.hnsw import (
    _dequantize,
    _quantize_segment,
    build_hnsw_segments,
    hnsw_topk,
)

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(3)
    rows = [
        (i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(400)
    ]
    return (
        rows,
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
    )


def _brute_topk(rows, q, k):
    q = np.asarray(q, dtype=np.float64)
    qn = np.linalg.norm(q)
    scored = []
    for i, v in rows:
        v64 = np.asarray(v, dtype=np.float32).astype(np.float64)
        den = np.linalg.norm(v64) * qn
        scored.append((i, float(v64 @ q / den) if den else 0.0))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return [(i, round(s, 6)) for i, s in scored[:k]]


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(1)
    v = rng.standard_normal((200, DIM)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    codes, lo, hi = _quantize_segment(v, confidence=1.0)
    assert codes.dtype == np.int8 and codes.min() >= 0 and codes.max() <= 127
    # full-confidence interval covers all values: error <= delta/2
    err = np.abs(_dequantize(codes, lo, hi) - v).max()
    assert err <= (hi - lo) / 127.0 / 2.0 + 1e-6


def test_quantized_exact_at_full_ef(spark, emb):
    """ef >= segment size ⇒ the beam visits everything, the float64
    re-rank of raw vectors makes top-k VALUE-identical to brute force
    (quantization only steers traversal)."""
    rows, df = emb
    graphs = build_hnsw_segments(
        df, rows_per_segment=128, m=8, beam_width=32, quantize=True
    )
    q = [float(np.cos(i * 0.37)) for i in range(DIM)]
    got = [
        (r["vec_id"], r["cos"])
        for r in hnsw_topk(graphs, q, k=10, ef=400).collect()
    ]
    assert got == _brute_topk(rows, q, 10)


def test_quantized_recall_vs_float(spark, emb):
    """at working ef, quantized traversal recall@10 vs the exact top-10
    stays high (>= 0.8 on this corpus) and matches the float path on
    at least 8/10."""
    rows, df = emb
    gq = build_hnsw_segments(
        df, rows_per_segment=128, m=8, beam_width=64, quantize=True
    )
    q = [float(np.sin(i * 0.53 + 0.2)) for i in range(DIM)]
    want = {i for i, _ in _brute_topk(rows, q, 10)}
    got_q = {r["vec_id"] for r in hnsw_topk(gq, q, k=10, ef=48).collect()}
    assert len(got_q & want) >= 8


def test_quantized_storage_shrinks(spark, emb):
    _, df = emb
    gq = build_hnsw_segments(df, rows_per_segment=128, quantize=True).collect()
    for r in gq:
        assert len(r["qvecs"]) * 4 == len(r["vecs"])
        assert r["q_lo"] < r["q_hi"]
