"""Index splitters: PKIndexSplitter and MultiPassIndexSplitter analogs.

- `misc/src/java/org/apache/lucene/misc/index/PKIndexSplitter.java:38`
  splits one index into two by a filter query (docs passing the
  primary-key predicate vs the rest), preserving deletes.
- `misc/src/java/org/apache/lucene/misc/index/
  MultiPassIndexSplitter.java:40` splits into `num_parts` parts, either
  sequential ID ranges or round-robin (``j % numParts == i``, the
  `seq=false` default).

The reference splits by marking everything else deleted and rewriting
the index once per part. The Spark re-expression splits the CORPUS
with a predicate/bucket filter and builds each part directly — each
split is one filtered scan (predicate pushed to parquet) + the normal
zero/one-shuffle index build, and parts build concurrently. Per-part
docIDs keep their global values, so cross-part search results union
without any remap (the disjoint-docID invariant the segment merger
relies on).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.index.builder import InvertedIndex

__all__ = ["pk_split", "multi_pass_split"]


def pk_split(
    corpus: DataFrame,
    predicate: Column,
    **build_kwargs,
) -> Tuple[InvertedIndex, InvertedIndex]:
    """Build two indexes: docs matching `predicate` and the complement
    (PKIndexSplitter.java:38 — there the predicate is a term range on
    the primary key; any Column predicate works here and pushes down
    to the scan)."""
    passing = InvertedIndex.build(corpus.filter(predicate), **build_kwargs)
    failing = InvertedIndex.build(corpus.filter(~predicate), **build_kwargs)
    return passing, failing


def multi_pass_split(
    corpus: DataFrame,
    num_parts: int,
    seq: bool = False,
    doc_id_col: str = "doc_id",
    **build_kwargs,
) -> List[InvertedIndex]:
    """Build `num_parts` indexes covering the corpus exactly once
    (MultiPassIndexSplitter.java:40): round-robin ``doc_id % n == i``
    by default, or `seq=True` for contiguous ranges computed from one
    min/max metadata agg (the reference's `seq` flag)."""
    if num_parts < 2:
        raise ValueError("num_parts must be >= 2")
    parts: List[InvertedIndex] = []
    if seq:
        lo, hi = corpus.agg(
            F.min(doc_id_col), F.max(doc_id_col)
        ).collect()[0]
        span = (hi - lo + 1 + num_parts - 1) // num_parts
        for i in range(num_parts):
            a, b = lo + i * span, lo + (i + 1) * span
            parts.append(
                InvertedIndex.build(
                    corpus.filter(
                        (F.col(doc_id_col) >= a) & (F.col(doc_id_col) < b)
                    ),
                    **build_kwargs,
                )
            )
    else:
        for i in range(num_parts):
            parts.append(
                InvertedIndex.build(
                    corpus.filter(F.col(doc_id_col) % num_parts == i),
                    **build_kwargs,
                )
            )
    return parts
