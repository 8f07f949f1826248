"""BPE vocabulary training + encoding (Sennrich et al. 2016): the
classic histogram's canonical merge progression, determinism,
truncation reporting, and the Arrow encode path."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_encode_udf,
    train_bpe,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # the paper's example histogram: low*5 lower*2 newest*6 widest*3,
    # spread over rows to exercise the distributed count
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    rows = [(i, " ".join(words[i::4])) for i in range(4)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_canonical_merges(corpus):
    res = train_bpe(corpus, num_merges=5)
    assert res["merges"] == [
        ("e", "s"),
        ("es", "t"),
        ("est", END_OF_WORD),
        ("l", "o"),
        ("lo", "w"),
    ]
    assert res["coverage"] == 1.0
    assert "est" + END_OF_WORD in res["vocab"] and "low" in res["vocab"]


def test_deterministic(corpus):
    a = train_bpe(corpus, num_merges=10)
    b = train_bpe(corpus.repartition(7), num_merges=10)
    assert a["merges"] == b["merges"]


def test_encode_rank_greedy(corpus):
    merges = train_bpe(corpus, num_merges=10)["merges"]
    assert bpe_encode("lowest", merges) == ["low", "est" + END_OF_WORD]
    assert bpe_encode("newest", merges) == ["newest" + END_OF_WORD]
    assert bpe_encode("low", merges) == ["low" + END_OF_WORD]
    # unseen characters stay split
    assert bpe_encode("xy", merges) == ["x", "y", END_OF_WORD]


def test_truncation_reported(corpus):
    res = train_bpe(corpus, num_merges=3, max_words=2)
    # kept newest(6)+low(5) of 16 tokens
    assert res["coverage"] == pytest.approx(11 / 16)


def test_merge_exhaustion_stops_early(spark):
    tiny = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    res = train_bpe(tiny, num_merges=50)
    # "ab</w>" fully merges after 2 steps; the loop must stop
    assert len(res["merges"]) == 2


def test_encode_udf(spark, corpus):
    merges = train_bpe(corpus, num_merges=10)["merges"]
    df = spark.createDataFrame(
        [(0, "lowest newest"), (1, None)], "doc_id long, text string"
    )
    rows = (
        df.select("doc_id", bpe_encode_udf(merges)("text").alias("pieces"))
        .orderBy("doc_id")
        .collect()
    )
    assert rows[0]["pieces"] == ["low", "est" + END_OF_WORD, "newest" + END_OF_WORD]
    assert rows[1]["pieces"] == []
