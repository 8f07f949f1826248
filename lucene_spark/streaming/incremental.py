"""Incremental index build: segment append + streaming ingestion.

Lucene is not a stream engine; its incremental surface is NRT segment
publishing (`index/DirectoryReader.java:168` openIfChanged,
`search/SearcherManager.java:53`) — new documents land in fresh
segments, readers refresh, merges fold them in later (SURVEY §2.7).
The Spark analog:

- :func:`append_batch` — index a new corpus batch into fresh segments
  (docIDs continue after the current maxDoc), union the block/terms/
  norms tables, recompute collection stats. No existing segment is
  rewritten — appends are pure additions, so a failed append is simply
  re-run (idempotent with deterministic docIDs).
- :func:`index_stream` — Structured Streaming ingestion: readStream →
  ``foreachBatch(append + save)``, with Spark's streaming checkpoint
  directory providing exactly-once batch tracking and the index
  manifest the commit point (the north rule's checkpoint/resume).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index.builder import InvertedIndex

__all__ = ["append_batch", "index_stream"]


def append_batch(
    index: InvertedIndex,
    new_corpus: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    analyzer: str = "simple",
) -> InvertedIndex:
    """Index `new_corpus` into fresh segments appended to `index`.

    `doc_id_col` values must be new (greater than any existing docID) —
    with deterministic docID assignment the caller derives them from
    data (e.g. rank over (warc_ts, url) offset by current maxDoc).
    """
    delta = InvertedIndex.build(
        new_corpus,
        text_col=text_col,
        doc_id_col=doc_id_col,
        analyzer=analyzer,
        docs_per_segment=index.docs_per_segment,
        positions=index.has_positions,
        payloads=index.has_payloads,
    )
    blocks = index.blocks.unionByName(delta.blocks)
    terms = (
        index.terms.unionByName(delta.terms)
        .groupBy("term")
        .agg(
            F.sum("doc_freq").alias("doc_freq"),
            F.sum("total_term_freq").alias("total_term_freq"),
        )
    )
    norms = index.norms.unionByName(delta.norms)
    return InvertedIndex(
        spark=index.spark,
        blocks=blocks,
        terms=terms,
        norms=norms,
        doc_count=index.doc_count + delta.doc_count,
        sum_total_term_freq=index.sum_total_term_freq + delta.sum_total_term_freq,
        docs_per_segment=index.docs_per_segment,
        num_segments=index.num_segments + delta.num_segments,
        metrics={**index.metrics, "last_append_docs": delta.doc_count},
        has_positions=index.has_positions,
        has_payloads=index.has_payloads,
        deletes=index.deletes,
        num_deleted=index.num_deleted,
        soft_deletes=index.soft_deletes,
        num_soft_deleted=index.num_soft_deleted,
    )


def index_stream(
    spark: SparkSession,
    input_path: str,
    schema: str,
    index_dir: str,
    checkpoint_dir: str,
    base_index: Optional[InvertedIndex] = None,
    analyzer: str = "simple",
    on_batch: Optional[Callable[[InvertedIndex, int], None]] = None,
):
    """Structured-Streaming ingestion into the index.

    Each micro-batch appends fresh segments and commits a new manifest;
    the streaming checkpoint makes re-delivered batches no-ops on
    restart. Returns the StreamingQuery (caller stops it).
    """
    state = {"index": base_index}

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = state["index"]
        if idx is None:
            idx = InvertedIndex.build(batch_df, analyzer=analyzer)
        else:
            idx = append_batch(idx, batch_df, analyzer=analyzer)
        idx.save(index_dir)
        state["index"] = idx
        if on_batch:
            on_batch(idx, epoch_id)

    stream = (
        spark.readStream.schema(schema).parquet(input_path)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return stream.start()
