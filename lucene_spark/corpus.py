"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1).

Generates the input table of `BASELINE.json` `input_hint`:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Fully deterministic and partition-independent: every value is a pure
function of (doc id, seed) via splitmix64-style hashing — no RNG state,
so the same (n_docs, seed) yields the same corpus on any cluster layout
and any re-run (checkpoint/resume-idempotent). Vectorized numpy inside
``mapInPandas`` (no per-token Python; the only Python loop is the
per-doc string join, which is C-speed ``str.join``).

Text is Zipf-distributed over a mixed vocabulary: the 33 English
stopwords at the head (so the skew the north rule worries about is
present), mixed-case words, numbers (``3.14``/``1,000``), apostrophe
words, some unicode/CJK/emoji — exercising the UAX#29 analyzer paths —
with doc lengths 0..~2000 tokens covering SmallFloat norm buckets.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["synthetic_corpus", "build_vocab", "CORPUS_SCHEMA"]

CORPUS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_LANGS = np.array(["en", "en", "en", "en", "en", "en", "de", "es", "fr", "zh"])


def build_vocab(size: int = 2000) -> np.ndarray:
    """Deterministic vocabulary; index 0 is the most frequent."""
    stop = (
        "a an and are as at be but by for if in into is it no not of on or "
        "such that the their then there these they this to was will with"
    ).split()
    common = (
        "Spark index segment merge posting BM25 score query term doc block "
        "shuffle partition parquet arrow batch vector stream web page crawl "
        "text html data search rank filter join group sort count fast slow "
        "big small can't o'clock 3.14 1,000 résumé naïve café Zürich 東京 "
        "漢字 データ 검색 🚀 ✨ The Quick Brown Fox"
    ).split()
    words: List[str] = stop + common
    i = 0
    while len(words) < size:
        words.append(f"term{i:05d}")
        i += 1
    return np.array(words[:size], dtype=object)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic per-element hash."""
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform(x: np.ndarray) -> np.ndarray:
    return (_mix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def synthetic_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    vocab_size: int = 2000,
    max_len: int = 2000,
    zipf_s: float = 1.07,
    num_partitions: int | None = None,
    with_doc_id: bool = False,
) -> DataFrame:
    """Return the deterministic corpus DataFrame (CORPUS_SCHEMA).

    with_doc_id=True prepends a dense deterministic ``doc_id`` column
    (= the generator ordinal — a pure function of the data, not of the
    partition layout, so it satisfies the deterministic-docID
    requirement directly and skips the rank-assignment pass).
    """
    vocab = build_vocab(vocab_size)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    weights = 1.0 / np.power(ranks, zipf_s)
    cdf = np.cumsum(weights / weights.sum())
    seed64 = np.uint64(seed * 0x9E3779B1 + 0x85EBCA77)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].values.astype(np.uint64)
            n = len(ids)
            # doc length: lognormal-ish from a uniform hash, a few empties
            u_len = _uniform(ids * np.uint64(3) + seed64)
            lens = np.minimum(
                (np.exp(u_len * np.log(max_len + 1)) - 1.0).astype(np.int64),
                max_len,
            )
            lens = np.where(_uniform(ids * np.uint64(5) + seed64) < 0.002, 0, lens)
            # log-uniform lengths: median ≈ sqrt(max_len), mean ≈ max_len/ln(max_len)
            # — spans every SmallFloat norm bucket deterministically.
            # per-position token draw: hash(doc_id, pos) → zipf(vocab)
            starts = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=starts[1:])
            total = int(starts[-1])
            # position *within each doc* (batch-offset-independent)
            pos = (
                np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], lens)
            ).astype(np.uint64)
            doc_of = np.repeat(ids, lens)
            u_tok = _uniform(doc_of * np.uint64(1_000_003) + pos * np.uint64(7) + seed64)
            tok_idx = np.searchsorted(cdf, u_tok, side="left")
            toks = vocab[tok_idx]
            texts = [
                " ".join(toks[s:e]) for s, e in zip(starts[:-1], starts[1:])
            ]
            urls = [f"https://host{int(i) % 97}.example/p/{int(i)}" for i in ids]
            ts = pd.to_datetime(
                1_500_000_000 + ids.astype(np.int64) * 7 + (_mix64(ids + seed64) % np.uint64(5)).astype(np.int64),
                unit="s",
            )
            htmls = [f"<html><body>{t}</body></html>".encode("utf-8") for t in texts]
            langs = _LANGS[(_mix64(ids * np.uint64(11) + seed64) % np.uint64(len(_LANGS))).astype(np.int64)]
            cols = {
                "url": urls,
                "warc_ts": ts,
                "html": htmls,
                "text": texts,
                "lang": langs,
            }
            if with_doc_id:
                cols = {"doc_id": ids.astype(np.int64), **cols}
            yield pd.DataFrame(cols)

    parts = num_partitions or spark.sparkContext.defaultParallelism
    schema = ("doc_id long, " + CORPUS_SCHEMA) if with_doc_id else CORPUS_SCHEMA
    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(gen, schema)
