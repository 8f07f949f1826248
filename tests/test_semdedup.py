"""SemDeDup (Abbas et al. 2023): cluster-bucketed semantic dedup.
Exact regime (n_lists=1) equals the brute-force pair closure; the
bucketed regime must keep co-clustered duplicate groups intact on
well-separated synthetic clusters."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.similarity import semdedup


def _clustered(spark, groups=4, dups=5, dim=16, seed=3):
    """groups of near-identical vectors pointing in orthogonal-ish
    directions + per-group jitter: every group is one duplicate
    component at threshold 0.99."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((groups, dim)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for g in range(groups):
        for _ in range(dups):
            v = base[g] + 0.001 * rng.standard_normal(dim).astype(np.float32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_exact_regime_components(spark):
    df = _clustered(spark)
    out = semdedup(df, threshold=0.99, n_lists=1, seed=7).orderBy("vec_id")
    rows = out.collect()
    # 4 groups of 5 -> representative = min id of each group of 5
    assert [r.cluster_id for r in rows] == [5 * (i // 5) for i in range(20)]
    assert sum(r.keep for r in rows) == 4


def test_bucketed_regime_is_conservative_with_good_recall(spark):
    # within-cluster pairs are a SUBSET of all pairs, so bucketing can
    # only split components: the kept set must be a superset of the
    # exact keepers (dedup never over-deletes), and on well-separated
    # groups k-means keeps most duplicates co-clustered (recall)
    df = _clustered(spark)
    exact = semdedup(df, 0.99, n_lists=1).collect()
    bucketed = semdedup(df, 0.99, n_lists=4).collect()
    exact_keep = {r.vec_id for r in exact if r.keep}
    bucketed_keep = {r.vec_id for r in bucketed if r.keep}
    assert bucketed_keep >= exact_keep
    dup_exact = sum(not r.keep for r in exact)
    dup_bucketed = sum(not r.keep for r in bucketed)
    assert dup_exact > 0 and dup_bucketed / dup_exact >= 0.6


def test_no_duplicates_keeps_everything(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = semdedup(df, threshold=0.999, n_lists=1).collect()
    assert all(r.keep and r.cluster_id == r.vec_id for r in out)
    assert len(out) == 30
