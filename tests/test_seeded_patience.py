"""SeededKnnVectorQuery + PatienceKnnVectorQuery analogs over the
segment-HNSW engine."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.search.hnsw import (
    _build_graph,
    _search_layer,
    build_hnsw_segments,
    hnsw_topk,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(7)
    # two well-separated clusters
    a = rng.normal(0, 0.05, (40, 8)) + np.array([1.0] + [0.0] * 7)
    b = rng.normal(0, 0.05, (40, 8)) + np.array([0.0] * 7 + [1.0])
    vecs = np.vstack([a, b])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def graphs(vec_df):
    return build_hnsw_segments(vec_df, m=8, beam_width=32, rows_per_segment=40)


def _brute(vec_df, q, k):
    qn = np.asarray(q) / np.linalg.norm(q)
    rows = vec_df.collect()
    sims = sorted(
        (
            (float(np.dot(np.asarray(r["embedding"]) / np.linalg.norm(r["embedding"]), qn)), r["vec_id"])
        for r in rows),
        key=lambda t: (-t[0], t[1]),
    )
    return [v for _, v in sims[:k]]


def test_seeded_matches_exact_at_full_ef(vec_df, graphs):
    q = [1.0] + [0.0] * 7
    want = _brute(vec_df, q, 10)
    got = [
        r["vec_id"]
        for r in hnsw_topk(graphs, q, k=10, ef=80, seed_ids=[0, 41]).collect()
    ]
    assert got == want


def test_seeded_good_entry_recall(vec_df, graphs):
    # seeds inside the right cluster give full recall at tiny ef
    q = [0.0] * 7 + [1.0]
    want = set(_brute(vec_df, q, 5))
    got = {
        r["vec_id"]
        for r in hnsw_topk(graphs, q, k=5, ef=8, seed_ids=sorted(want)).collect()
    }
    assert got == want


def test_patience_stops_early_and_keeps_quality():
    rng = np.random.RandomState(3)
    vecs = rng.normal(0, 1, (300, 8)).astype(np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _levels, nbrs, entry, top = _build_graph(vecs.astype(np.float32), 8, 32, seed=1)
    q = vecs[17]
    full_stats, pat_stats = {}, {}
    full_ids, _ = _search_layer(
        vecs, nbrs, q, [entry], 40, 0, stats=full_stats
    )
    pat_ids, _ = _search_layer(
        vecs, nbrs, q, [entry], 40, 0, patience=2, stats=pat_stats
    )
    assert pat_stats["visited"] <= full_stats["visited"]
    assert pat_stats.get("saturated", 0) >= 1
    # quality: the true nearest (the query itself) survives patience
    assert pat_ids[0] == 17
    # large overlap with the untruncated beam
    assert len(set(pat_ids[:10]) & set(full_ids[:10])) >= 7


def test_patience_none_is_exhaustive():
    rng = np.random.RandomState(5)
    vecs = rng.normal(0, 1, (60, 4))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _levels, nbrs, entry, top = _build_graph(vecs.astype(np.float32), 6, 24, seed=2)
    a, _ = _search_layer(vecs, nbrs, vecs[3], [entry], 20, 0)
    b, _ = _search_layer(vecs, nbrs, vecs[3], [entry], 20, 0, patience=None)
    assert a == b
