"""Time-limited search: partial top-k under a wall-clock budget.

Reference parity targets:
  - lucene/core/src/java/org/apache/lucene/search/TimeLimitingBulkScorer.java:28
    (score in intervals — 100 docs, growing 8% per interval — and check
    the clock BETWEEN intervals; on expiry stop and surface
    TimeExceededException)
  - core/search/IndexSearcher.java `setTimeout`/`timedOut()` (the
    searcher converts the exception into PARTIAL results: everything
    collected before the deadline is returned and ``timedOut()`` flips)
  - core/search/TimeLimitingKnnCollectorManager.java:30 (same contract
    for vector search)

Spark re-expression: the scoring interval becomes a CHUNK OF SEGMENTS
(segment = contiguous docID range): each chunk is one narrow Spark job
over that chunk's posting blocks (`dataclasses.replace` view — same
terms/norms/global stats, so BM25 idf/avgdl are exact regardless of how
far scoring got), the clock is checked between chunk jobs on the
driver, and the accumulated per-chunk top-k (k rows per chunk, driver
memory is k·chunks bounded) merges into the final partial result.  The
chunk size grows 8% per round like the reference's interval.  The
clock is injectable for deterministic tests.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.builder import InvertedIndex

__all__ = ["time_limited_topk"]


def time_limited_topk(
    index: InvertedIndex,
    term_boosts: Dict[str, float],
    k: int = 10,
    budget_ms: Optional[float] = None,
    chunk_segments: int = 4,
    clock_ms: Optional[Callable[[], float]] = None,
) -> Tuple[DataFrame, bool]:
    """BM25 top-k with a time budget; returns ``(topk, timed_out)``.

    The first chunk always runs (TimeLimitingBulkScorer scores its
    first interval before the first clock check), so the result is
    never empty when there are matches.  ``timed_out=True`` means the
    returned top-k covers only the segment prefix scored before the
    deadline — the reference's partial-results contract.  Pass
    ``clock_ms`` to pin the clock in tests; ``budget_ms=None`` scores
    everything (no timeout configured).
    """
    from lucene_spark.search.parity import _bm25_scored_f64

    if chunk_segments < 1:
        raise ValueError("chunk_segments must be >= 1")
    clock = clock_ms if clock_ms is not None else (lambda: time.monotonic() * 1000.0)

    seg_ids = sorted(
        r["segment_id"]
        for r in index.blocks.select("segment_id").distinct().collect()
    )
    start = clock()
    chunks = []
    i = 0
    width = max(1, int(chunk_segments))
    while i < len(seg_ids):
        chunks.append(seg_ids[i : i + width])
        i += width
        width = max(width + 1, int(width * 1.08))  # interval growth, ref :48

    # each chunk MUST be an executed job, not a lazy plan — otherwise
    # the budget never bounds real work and the caller's final action
    # scores everything after timed_out was decided. The per-chunk
    # collect is k rows (driver memory k·chunks bounded).
    collected = []
    timed_out = False
    for ci, chunk in enumerate(chunks):
        if budget_ms is not None and ci > 0 and clock() - start > budget_ms:
            timed_out = True
            break
        view = dataclasses.replace(
            index, blocks=index.blocks.filter(F.col("segment_id").isin(chunk))
        )
        scored = _bm25_scored_f64(view, term_boosts)
        collected.extend(
            (int(r["doc_id"]), float(r["s"]))
            for r in scored.orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(k)
            .collect()
        )

    collected.sort(key=lambda t: (-t[1], t[0]))
    topk = index.spark.createDataFrame(
        collected[:k] or [], "doc_id long, s double"
    )
    return topk, timed_out
