"""Deterministic sampling + sequence packing: reproducibility across
partitionings, rate accuracy, and packing invariants.
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.sampling import (
    hash_sample,
    pack_sequences,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], 10 + (i * 37) % 90) for i in range(3000)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "n_tokens"]).cache()


def test_hash_sample_rate_and_determinism(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=7).collect()}
    # partition layout must not matter
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(17), 0.3, seed=7).collect()
    }
    assert a == b
    assert 0.25 < len(a) / 3000 < 0.35
    # different seed → different (but same-rate) selection
    c = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=8).collect()}
    assert c != a


def test_hash_sample_monotone_in_fraction(docs):
    small = {r["doc_id"] for r in hash_sample(docs, 0.1, seed=1).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, 0.5, seed=1).collect()}
    assert small <= big  # nested samples: a bigger fraction is a superset


def test_stratified_sample(docs):
    got = stratified_sample(
        docs, {"en": 1.0, "de": 0.2}, strata_col="lang", seed=3
    ).groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert by_lang["en"] == 1000  # fraction 1.0 keeps everything
    assert 120 < by_lang.get("de", 0) < 280
    assert "fr" not in by_lang  # default fraction 0


def test_pack_sequences_invariants(docs):
    target = 2000
    packed = pack_sequences(docs, target, "n_tokens", "doc_id", num_partitions=7)
    rows = sorted(
        packed.select("doc_id", "n_tokens", "shard").collect(),
        key=lambda r: r["doc_id"],
    )
    # shard ids are non-decreasing in doc order
    shards = [r["shard"] for r in rows]
    assert shards == sorted(shards)
    # matches the serial greedy computation exactly
    acc = 0
    for r in rows:
        assert r["shard"] == acc // target
        acc += r["n_tokens"]
    # every shard except possibly the last holds ≥ target - max_doc_tokens
    sums = {}
    for r in rows:
        sums[r["shard"]] = sums.get(r["shard"], 0) + r["n_tokens"]
    max_tok = max(r["n_tokens"] for r in rows)
    for s, tot in sums.items():
        if s != max(sums):
            assert tot >= target - max_tok


def test_pack_sequences_oversize_doc_own_shard(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 5000), (2, 10)], ["doc_id", "n_tokens"]
    )
    rows = {r["doc_id"]: r["shard"] for r in pack_sequences(df, 100, num_partitions=2).collect()}
    assert rows[0] == 0
    assert rows[1] == 0 or rows[1] != rows[2]  # long doc separates 0 and 2
    assert rows[2] > rows[1] or rows[1] > rows[0]
