"""Per-segment HNSW graphs (`util/hnsw/HnswGraphBuilder.java`,
KnnFloatVectorQuery per-leaf search + merge)."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search.hnsw import build_hnsw_segments, hnsw_topk


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(300), "embedding": [v.tolist() for v in vecs]}
    )
    return spark.createDataFrame(pdf)


def _brute(emb, q, k):
    rows = emb.collect()
    q = np.asarray(q, dtype=np.float64)
    scored = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        cos = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        scored.append((round(cos, 6), r["vec_id"]))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [(vid, c) for c, vid in scored[:k]]


def test_exact_at_generous_ef(spark, emb):
    graphs = build_hnsw_segments(emb, rows_per_segment=100, m=8, beam_width=64).persist()
    q = [float(np.cos(i)) for i in range(16)]
    got = [
        (r["vec_id"], r["cos"]) for r in hnsw_topk(graphs, q, k=10, ef=128).collect()
    ]
    assert got == _brute(emb, q, 10)
    graphs.unpersist()


def test_multi_segment_merge(spark, emb):
    # 3 segments vs 1 segment: same query, same exact result set
    g3 = build_hnsw_segments(emb, rows_per_segment=100, m=8, beam_width=64)
    g1 = build_hnsw_segments(emb, rows_per_segment=1000, m=8, beam_width=64)
    q = [1.0] * 16
    r3 = [(r["vec_id"], r["cos"]) for r in hnsw_topk(g3, q, k=5, ef=128).collect()]
    r1 = [(r["vec_id"], r["cos"]) for r in hnsw_topk(g1, q, k=5, ef=128).collect()]
    assert r3 == r1 == _brute(emb, q, 5)


def test_recall_at_moderate_ef(spark, emb):
    graphs = build_hnsw_segments(emb, rows_per_segment=1000, m=16, beam_width=100).persist()
    rng = np.random.default_rng(3)
    total = hits = 0
    for _ in range(5):
        q = rng.normal(size=16).astype(float).tolist()
        approx = {r["vec_id"] for r in hnsw_topk(graphs, q, k=10, ef=60).collect()}
        exact = {v for v, _ in _brute(emb, q, 10)}
        hits += len(approx & exact)
        total += 10
    assert hits / total >= 0.9
    graphs.unpersist()


def test_deterministic_rebuild(spark, emb):
    q = [0.5] * 16
    a = hnsw_topk(build_hnsw_segments(emb, rows_per_segment=100), q, k=10, ef=64).collect()
    b = hnsw_topk(build_hnsw_segments(emb, rows_per_segment=100), q, k=10, ef=64).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_graphs_persist_roundtrip(spark, emb, tmp_path):
    path = str(tmp_path / "hnsw")
    build_hnsw_segments(emb, rows_per_segment=100).write.parquet(path)
    loaded = spark.read.parquet(path)
    q = [float(np.sin(i)) for i in range(16)]
    got = [(r["vec_id"], r["cos"]) for r in hnsw_topk(loaded, q, k=10, ef=128).collect()]
    assert got == _brute(emb, q, 10)


def test_zero_vectors_score_zero_not_nan(spark):
    """Zero-norm embeddings must score 0.0, not NaN (Spark sorts NaN
    above every double — a NaN would rank first; review finding)."""
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [[0.0] * 8, [1.0] * 8, [0.5] * 8],
        }
    )
    emb0 = spark.createDataFrame(pdf)
    graphs = build_hnsw_segments(emb0, rows_per_segment=10, m=4, beam_width=16)
    rows = hnsw_topk(graphs, [1.0] * 8, k=3, ef=16).collect()
    by_id = {r["vec_id"]: r["cos"] for r in rows}
    assert by_id[0] == 0.0
    assert rows[0]["vec_id"] in (1, 2) and rows[0]["cos"] == 1.0
