"""Int8-quantized IVF: recall vs exact brute force, storage shrink,
and exactness when probes + refine cover everything."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.pipeline.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_quantize,
    ivf_quantized_topk,
)

DIM = 16


@pytest.fixture(scope="module")
def assigned(spark):
    rng = np.random.RandomState(17)
    rows = [
        (i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a, cent = ivf_assign(df, n_lists=8, seed=7)
    aq, bounds = ivf_quantize(a, seed=7)
    return df, aq.persist(), cent, bounds


def test_quantized_codes_are_one_byte_per_component(assigned):
    _, aq, _, bounds = assigned
    lo, hi = bounds
    assert lo < hi
    row = aq.limit(1).collect()[0]
    assert len(row["qcode"]) == DIM  # vs 4 * DIM float32 bytes


def test_full_probe_full_refine_is_exact(assigned):
    df, aq, cent, bounds = assigned
    q = [float(np.cos(0.31 * i + 1.0)) for i in range(DIM)]
    got = [
        (r["vec_id"], r["cos"])
        for r in ivf_quantized_topk(
            aq, cent, bounds, q, k=10, n_probes=8, refine=50
        ).collect()
    ]
    want = [(r["vec_id"], r["cos"]) for r in cosine_topk(df, q, k=10).collect()]
    assert got == want


def test_quantized_probe_recall(assigned):
    df, aq, cent, bounds = assigned
    q = [float(np.sin(0.47 * i)) for i in range(DIM)]
    want = {r["vec_id"] for r in cosine_topk(df, q, k=10).collect()}
    got = {
        r["vec_id"]
        for r in ivf_quantized_topk(
            aq, cent, bounds, q, k=10, n_probes=4, refine=4
        ).collect()
    }
    assert len(got & want) >= 7
