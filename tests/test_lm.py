"""Bigram-LM perplexity (CCNet-style quality signal): smoothing
arithmetic on a hand-computable corpus, unseen-token floors, ranking
behavior (in-domain text scores lower perplexity than noise)."""

import math

import pytest

from lucene_spark.pipeline.lm import perplexity, train_bigram_lm

REF = [
    (0, "the cat sat"),
    (1, "the cat ran"),
]


@pytest.fixture(scope="module")
def model(spark):
    return train_bigram_lm(spark.createDataFrame(REF, ["doc_id", "text"]), k=0.5)


def test_vocab_and_counts(model):
    # unigrams: the, cat, sat, ran -> V = 4 + 1
    assert model.vocab_size == 5
    big = {(r["prev"], r["cur"]): r["c2"] for r in model.bigrams.collect()}
    assert big[("<s>", "the")] == 2 and big[("the", "cat")] == 2
    assert big[("cat", "sat")] == 1 and big[("cat", "ran")] == 1


def test_perplexity_hand_computed(spark, model):
    df = spark.createDataFrame([(10, "the cat sat")], ["doc_id", "text"])
    row = perplexity(df, model).collect()[0]
    k, kv = 0.5, 0.5 * 5
    # contexts: <s> seen 2x, 'the' 2x, 'cat' 2x; bigram counts 2,2,1
    lp = (
        math.log10((2 + k) / (2 + kv))
        + math.log10((2 + k) / (2 + kv))
        + math.log10((1 + k) / (2 + kv))
    )
    assert row["n_tokens"] == 3
    assert row["log10_ppl"] == pytest.approx(-lp / 3, abs=1e-6)


def test_unseen_floors(spark, model):
    df = spark.createDataFrame([(11, "zebra quux")], ["doc_id", "text"])
    row = perplexity(df, model).collect()[0]
    k, kv = 0.5, 0.5 * 5
    # <s>->zebra: context seen (c1=2), bigram unseen; zebra->quux:
    # context unseen -> k/kV floor
    lp = math.log10((0 + k) / (2 + kv)) + math.log10(k / kv)
    assert row["log10_ppl"] == pytest.approx(-lp / 2, abs=1e-6)


def test_in_domain_ranks_cleaner(spark, model):
    df = spark.createDataFrame(
        [(20, "the cat sat"), (21, "xq zr pw lk jh")], ["doc_id", "text"]
    )
    rows = perplexity(df, model).collect()
    assert [r["doc_id"] for r in rows] == [20, 21]  # asc = cleaner first
