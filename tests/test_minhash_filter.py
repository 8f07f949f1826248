"""MinHashFilter exact parity vs TestMinHashFilter.java vectors
(murmur3_x64_128, combineOrdered re-hash, bucketed min-keeping,
rotation, and UTF-16 token emission)."""

import pytest

from lucene_spark.analysis.minhash import (
    min_hash_hex,
    min_hash_tokens,
    murmur3_x64_128,
)


def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def test_int_hash():
    # TestMinHashFilter.testIntHash
    v1, v2 = murmur3_x64_128((0).to_bytes(4, "big"))
    assert _signed(v1) == -3485513579396041028
    assert _signed(v2) == 6383328099726337777


def test_string_hash():
    # TestMinHashFilter.testStringHash (UTF-16LE bytes)
    v1, v2 = murmur3_x64_128("woof woof woof woof woof".encode("utf-16-le"))
    assert _signed(v1) == 7638079586852243959
    assert _signed(v2) == 4378804943379391304


def test_single_input_token():
    # TestMinHashFilter.testTokenStreamSingleInput, hashCount=1
    toks = ["woof woof woof woof woof"]
    out = min_hash_tokens(toks, 1, 1, 100, False)
    assert len(out) == 1
    assert [ord(c) for c in out[0]][:6] == [
        8449, 54077, 64133, 32857, 8605, 41409
    ]


def test_two_hashes_prefix():
    # hashCount=2: tokens carry the 2-char hash-index prefix
    toks = ["woof woof woof woof woof"]
    out = min_hash_tokens(toks, 2, 1, 1, False)
    assert [[ord(c) for c in t] for t in out] == [
        [0, 0, 8449, 54077, 64133, 32857, 8605, 41409],
        [0, 1, 16887, 58164, 39536, 14926, 6529, 17276],
    ]


def test_two_shingles():
    # TestMinHashFilter.testTokenStream1 second hash
    toks = ["woof woof woof woof woof", "woof woof woof woof puff"]
    out = min_hash_tokens(toks, 1, 1, 100, False)
    assert len(out) == 2
    assert [36347, 63457, 43013, 56843, 52284, 34231, 57934, 42302] in [
        [ord(c) for c in t] for t in out
    ]


def test_rotation_fills_all_buckets():
    # with rotation + hashSetSize=1, every (hash, bucket) slot emits:
    # fixed hashCount*bucketCount signature per doc (LSH-ready)
    toks = ["only one shingle here x"]
    out = min_hash_hex(toks, hash_count=3, bucket_count=4, hash_set_size=1)
    assert len(out) == 12
    # without rotation, only occupied buckets emit
    out2 = min_hash_hex(
        toks, hash_count=3, bucket_count=4, hash_set_size=1,
        with_rotation=False,
    )
    assert len(out2) == 3


def test_dedup_within_set():
    # identical shingles hash identically and are kept once per set
    toks = ["same shingle"] * 5
    out = min_hash_hex(toks, 1, 1, 100, with_rotation=False)
    assert len(out) == 1


def test_hash_set_size_keeps_smallest():
    toks = [f"shingle number {i}" for i in range(20)]
    all_ = sorted(min_hash_hex(toks, 1, 1, 100, with_rotation=False))
    top3 = min_hash_hex(toks, 1, 1, 3, with_rotation=False)
    assert top3 == sorted(all_)[:3]


def test_validation():
    with pytest.raises(ValueError):
        min_hash_hex(["x"], hash_count=0)


def test_udf(spark):
    from pyspark.sql import functions as F

    from lucene_spark.analysis.minhash import min_hash_udf

    df = spark.createDataFrame(
        [(["woof woof woof woof woof"],), (None,)],
        "shingles array<string>",
    )
    out = df.select(
        min_hash_udf(1, 1, 100, False)("shingles").alias("sig")
    ).collect()
    assert out[0].sig == ["0:2101d33dfa858059219da1c1d671676f"]
    assert out[1].sig is None
