"""Faiss index-factory front end (sandbox/codecs/faiss/
FaissKnnVectorsFormat.java:59): description parsing, engine routing
equivalence, the native-library boundary."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search.knnformat import (
    KnnIndexSpec,
    knn_index_topk,
    parse_index_factory,
)


def test_parse_descriptions():
    assert parse_index_factory("Flat") == KnnIndexSpec("flat")
    assert parse_index_factory("IDMap,Flat") == KnnIndexSpec("flat")
    assert parse_index_factory("HNSW32") == KnnIndexSpec("hnsw", m=32)
    assert parse_index_factory("IDMap,HNSW16,SQ8") == KnnIndexSpec(
        "hnsw", m=16, quantize=True
    )
    assert parse_index_factory("IVF64,Flat") == KnnIndexSpec("ivf", nlist=64)
    assert parse_index_factory("ivf8,sq8") == KnnIndexSpec(
        "ivf", nlist=8, quantize=True
    )


@pytest.mark.parametrize(
    "bad", ["", "IDMap", "PQ16", "Flat,SQ8", "IVF8,HNSW4", "LSH"]
)
def test_parse_rejects_unknown(bad):
    with pytest.raises(ValueError):
        parse_index_factory(bad)


def test_native_boundary_is_loud(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [[1.0, 0.0]]})
    )
    with pytest.raises(NotImplementedError, match="faiss"):
        knn_index_topk(df, [1.0, 0.0], description="Flat", native=True)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 8)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(200), "embedding": [v.tolist() for v in vecs]}
    )
    return spark.createDataFrame(pdf).cache()


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_flat_routes_to_exact(emb):
    from lucene_spark.pipeline.similarity import cosine_topk

    q = [float(x) for x in range(1, 9)]
    assert _ids(knn_index_topk(emb, q, k=10, description="IDMap,Flat")) == _ids(
        cosine_topk(emb, q, k=10)
    )


def test_ivf_full_probe_is_exact(emb):
    from lucene_spark.pipeline.similarity import cosine_topk

    q = [float(x) for x in range(1, 9)]
    got = _ids(
        knn_index_topk(emb, q, k=10, description="IVF4,Flat", n_probes=4)
    )
    assert got == _ids(cosine_topk(emb, q, k=10))


def test_hnsw_routing_recall(emb):
    from lucene_spark.pipeline.similarity import cosine_topk

    q = [float(x) for x in range(1, 9)]
    got = set(_ids(knn_index_topk(emb, q, k=10, description="HNSW16", ef=64)))
    exact = set(_ids(cosine_topk(emb, q, k=10)))
    assert len(got & exact) >= 9  # single small segment, wide beam
