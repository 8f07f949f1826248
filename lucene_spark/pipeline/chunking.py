"""Sentence-window document chunking for RAG / context packing.

A training-data or retrieval pipeline rarely indexes whole web pages —
it indexes overlapping windows of w sentences advanced by a stride of s
(w > s gives overlap so answers spanning a boundary survive).  This op
composes:

  1. ONE Arrow-batched sentence-segmentation pass per document
     (``analysis/opennlp.py::sentences_udf`` — the
     OpenNLPSentenceBreakIterator.java:33 analog), and
  2. pure JVM window assembly: each sentence i joins every window
     k ∈ [ceil((i-w+1)/s), floor(i/s)] via an exploded ``sequence``,
     then one groupBy(doc, k) rebuilds window text in sentence order.

Scale notes (100 TB): the only wide op is the groupBy on
(doc_id, window_id) — keys are unique per document so there is no skew
by construction, and the map side emits at most ceil(w/s) rows per
sentence (the overlap factor, typically 2).  No Python executes after
the segmentation pass; window membership, ordering, and concatenation
are all codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["sentence_windows"]


def sentence_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    stride: int = 2,
) -> DataFrame:
    """Overlapping sentence windows: window k of a document covers
    sentences [k*stride, k*stride + window).

    Returns (id_col, chunk_id, chunk_text, n_sentences, first_sentence)
    with one row per non-empty window, deterministic order within a
    document.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    from lucene_spark.analysis.opennlp import sentences_udf

    sents = df.select(
        F.col(id_col),
        F.posexplode(sentences_udf()(F.col(text_col))).alias("i", "sentence"),
    )
    # windows containing sentence i: ceil((i-w+1)/s) .. floor(i/s), >= 0
    lo = F.greatest(
        F.lit(0), F.ceil((F.col("i") - F.lit(window - 1)) / F.lit(stride))
    ).cast("int")
    hi = F.floor(F.col("i") / F.lit(stride)).cast("int")
    member = sents.select(
        id_col,
        "i",
        "sentence",
        F.explode(F.sequence(lo, hi)).alias("chunk_id"),
    )
    assembled = member.groupBy(id_col, "chunk_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("i"), F.col("sentence")))
        ).alias("parts")
    )
    return assembled.select(
        id_col,
        "chunk_id",
        F.concat_ws(
            " ", F.transform(F.col("parts"), lambda p: p["sentence"])
        ).alias("chunk_text"),
        F.size("parts").alias("n_sentences"),
        F.element_at(F.col("parts"), 1)["i"].alias("first_sentence"),
    )
