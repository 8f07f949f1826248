"""Float32-exact BM25 scoring, replicating Lucene's arithmetic.

Reference semantics
(`lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java:101-238`):

- ``idf = (float) Math.log(1 + (docCount - docFreq + 0.5d) / (docFreq + 0.5d))``
  — float64 log, cast to float32 (`:102-104`).
- ``avgdl = (float) (sumTotalTermFreq / (double) docCount)`` (`:107-109`).
- 256-entry norm-inverse cache
  ``cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))``
  evaluated in float32 in exactly that order (`:181-184`).
- ``weight = boost * idf`` (float32, `:213`).
- ``score(freq, norm) = weight - weight / (1 + freq * cache[norm & 0xFF])``
  all float32 (`:221-238` — the ``1 - 1/(1+x)`` rewrite guarantees
  monotonicity without promoting to double).

The kernel is pure numpy (float32 end-to-end) so it can run inside
Arrow-batched pandas UDFs; :meth:`BM25.cache_literal` exposes the cache
for JVM-side Spark SQL scoring (Spark float arithmetic == Java float
arithmetic, so the SQL expression path is also bit-exact).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from lucene_spark.functions.smallfloat import LENGTH_TABLE

__all__ = ["bm25_idf", "bm25_cache", "BM25"]

K1_DEFAULT = np.float32(1.2)
B_DEFAULT = np.float32(0.75)


def bm25_idf(doc_freq: int, doc_count: int) -> np.float32:
    """Lucene BM25 idf: float64 math.log then cast to float32."""
    return np.float32(math.log(1 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def bm25_avgdl(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """float64 division cast to float32 (`BM25Similarity.java:107-109`)."""
    return np.float32(sum_total_term_freq / float(doc_count))


def bm25_cache(avgdl: np.float32, k1: np.float32 = K1_DEFAULT, b: np.float32 = B_DEFAULT) -> np.ndarray:
    """256-entry normInverse cache, float32 in Lucene's evaluation order."""
    k1 = np.float32(k1)
    b = np.float32(b)
    avgdl = np.float32(avgdl)
    one = np.float32(1.0)
    # 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))
    return one / (k1 * ((one - b) + b * LENGTH_TABLE / avgdl))


@dataclass
class BM25:
    """A bound BM25 scorer for one (collection stats, term stats, boost).

    Mirrors ``BM25Similarity.scorer(boost, collectionStats, termStats)``.
    """

    doc_freq: int
    doc_count: int
    sum_total_term_freq: int
    boost: float = 1.0
    k1: float = 1.2
    b: float = 0.75
    idf: np.float32 = field(init=False)
    avgdl: np.float32 = field(init=False)
    weight: np.float32 = field(init=False)
    cache: np.ndarray = field(init=False)

    def __post_init__(self) -> None:
        self.idf = bm25_idf(self.doc_freq, self.doc_count)
        self.avgdl = bm25_avgdl(self.sum_total_term_freq, self.doc_count)
        self.weight = np.float32(self.boost) * self.idf
        self.cache = bm25_cache(self.avgdl, np.float32(self.k1), np.float32(self.b))

    def score(self, freq, norm_byte) -> np.ndarray:
        """Vectorized float32 score for (freq, encoded norm byte) arrays."""
        freq = np.asarray(freq, dtype=np.float32)
        ni = self.cache[np.asarray(norm_byte).astype(np.int64) & 0xFF]
        w = self.weight
        return w - w / (np.float32(1.0) + freq * ni)

    def max_score(self, max_freq, min_norm_byte) -> np.float32:
        """Score upper bound for a block given its competitive impacts.

        Mirrors ``MaxScoreCache.computeMaxScore`` — the max over impact
        pairs of score(freq, norm); callers pass the pareto frontier.
        """
        s = self.score(np.asarray(max_freq), np.asarray(min_norm_byte))
        return np.float32(np.max(s)) if s.size else np.float32(0.0)
