"""DSIR importance resampling (Xie et al. 2023): weight direction
(target-like docs up, raw-only noise down), determinism of the
derandomized Gumbel-top-k, smoothing floor behavior."""

import pytest

from lucene_spark.pipeline.dsir import dsir_log_weights, dsir_resample

RAW = [
    (0, "clean prose about search engines and indexes"),
    (1, "clean prose about search engines and ranking"),
    (2, "spam spam buy now spam click spam spam"),
    (3, "spam click buy spam now spam spam spam"),
]
TARGET = [
    (100, "clean prose about search and ranking"),
    (101, "prose about engines and indexes"),
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"]).cache()
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"]).cache()
    return raw, tgt


def test_weights_favor_target_like_docs(frames):
    raw, tgt = frames
    w = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(raw, tgt, n_buckets=512).collect()
    }
    assert set(w) == {0, 1, 2, 3}
    # target-like docs outweigh the spam docs
    assert min(w[0], w[1]) > max(w[2], w[3])


def test_resample_deterministic_and_ranked(frames):
    raw, tgt = frames
    a = [r["doc_id"] for r in dsir_resample(raw, tgt, k=2, n_buckets=512).collect()]
    b = [r["doc_id"] for r in dsir_resample(raw, tgt, k=2, n_buckets=512).collect()]
    assert a == b  # md5-derandomized Gumbel: engine/layout independent
    assert set(a) <= {0, 1}  # the clean docs win at this weight gap


def test_seed_changes_noise_not_weights(frames):
    raw, tgt = frames
    r1 = {r["doc_id"]: r["log_w"] for r in dsir_resample(raw, tgt, 4, 512, seed=1).collect()}
    r2 = {r["doc_id"]: r["log_w"] for r in dsir_resample(raw, tgt, 4, 512, seed=2).collect()}
    assert r1 == r2  # log_w is seed-free; only the Gumbel key moves
