"""IndexRearranger analog: rebuild an index into a PRESCRIBED segment
layout, one segment per document selector.

Reference parity targets:
  - lucene/misc/src/java/org/apache/lucene/misc/index/IndexRearranger.java:28
    (each DocumentSelector produces one output segment; segments appear
    in selector order; a document selected never or twice is an error)
  - IndexRearranger.java:38 (``deletedDocsSelector``: docs marked
    deleted in the rearranged index but NOT merged away)
  - misc/index/BinaryDocValueSelector.java (the selector seam — here
    any boolean Column over the corpus)

Spark re-expression: selector index becomes the segment id; new doc
ids are ``segment * docs_per_segment + rank-within-segment`` with
``docs_per_segment = max selector size``, preserving the repo's
contiguous-range segment invariant (selector sizes vary, so ranges may
have a sparse tail — harmless, postings only reference live ids).  The
one wide op is the repartition-by-segment + within-partition sort that
the aligned build performs anyway; validation (every doc selected
exactly once) is a single conditional-sum pass.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window, functions as F

from lucene_spark.index.builder import InvertedIndex

__all__ = ["rearrange"]


def rearrange(
    corpus: DataFrame,
    selectors: Sequence[Column],
    deleted_selector: Optional[Column] = None,
    doc_id_col: str = "doc_id",
    analyzer: str = "simple",
    **build_kw,
) -> Tuple[InvertedIndex, DataFrame]:
    """Rebuild ``corpus`` into one segment per selector.

    Returns ``(index, mapping)`` where mapping is
    (orig_doc_id, doc_id, segment_id) — the rearranged identity of every
    document.  Raises when any document is selected by zero or by more
    than one selector (IndexRearranger's "selected more than once" /
    "not selected" errors).  ``deleted_selector`` docs are marked
    deleted in the new index without being merged away
    (IndexRearranger.java:38).
    """
    if not selectors:
        raise ValueError("at least one selector is required")
    hits = None
    for s in selectors:
        h = F.when(s, 1).otherwise(0)
        hits = h if hits is None else hits + h
    bad = corpus.filter(hits != 1).count()
    if bad:
        raise ValueError(
            f"{bad} documents selected zero or multiple times — selectors "
            "must partition the corpus (IndexRearranger semantics)"
        )
    seg = None
    for i, s in enumerate(reversed(selectors)):
        idx = len(selectors) - 1 - i
        seg = F.when(s, F.lit(idx)) if seg is None else F.when(s, F.lit(idx)).otherwise(seg)

    tagged = corpus.withColumn("_seg", seg)
    sizes = {
        r["_seg"]: r["c"]
        for r in tagged.groupBy("_seg").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    dps = max(sizes.values())
    w = Window.partitionBy("_seg").orderBy(doc_id_col)
    remapped = tagged.select(
        F.col(doc_id_col).alias("orig_doc_id"),
        "_seg",
        (F.col("_seg") * F.lit(dps) + F.row_number().over(w) - 1).alias(doc_id_col),
        *[c for c in corpus.columns if c != doc_id_col],
    )
    mapping = remapped.select(
        "orig_doc_id", doc_id_col, F.col("_seg").alias("segment_id")
    ).persist()
    mapping.count()

    index = InvertedIndex.build(
        remapped.drop("_seg", "orig_doc_id"),
        analyzer=analyzer,
        docs_per_segment=int(dps),
        **build_kw,
    )
    if index.num_segments != len(selectors):
        # uneven selector sizes leave sparse tails; the prescribed
        # layout has exactly one segment per selector regardless
        import dataclasses

        index = dataclasses.replace(index, num_segments=len(selectors))
    if deleted_selector is not None:
        from lucene_spark.index.deletes import _with_deletes

        # the selector is written against the ORIGINAL corpus (same as
        # the segment selectors), so evaluate it pre-remap and map the
        # doomed originals to their rearranged ids; stays a DataFrame —
        # no driver round-trip for the doomed set
        doomed_orig = corpus.filter(deleted_selector).select(
            F.col(doc_id_col).alias("orig_doc_id")
        )
        doomed = mapping.join(doomed_orig, "orig_doc_id").select(doc_id_col)
        index = _with_deletes(index, doomed)
    return index, mapping
