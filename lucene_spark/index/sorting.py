"""Index sorting (`IndexWriterConfig.setIndexSort`).

Lucene can store each segment's documents physically ordered by a
sort field (`index/Sorter.java`, applied at flush/merge): queries
sorted by that field then early-terminate after k hits per segment
(`TopFieldCollector` with `totalHitsThreshold`), and range queries on
the sort field become contiguous docID ranges.

The Spark re-expression reassigns docIDs in sort order BEFORE the
build — a one-time global range shuffle, the same cost Lucene pays in
its flush-time sorter, paid once at ingest:

- :func:`sort_docs` — scale-correct distributed ranking: range
  repartition on the sort key, sort within partitions, then per-
  partition row numbers offset by a driver-side cumulative count (one
  tiny action over partition counts — never a single-task global
  window).
- After the build, "top-k by the sort field" is ``ORDER BY doc_id
  LIMIT k`` — `TakeOrderedAndProject` on a long, no field lookup
  join, and the winning docs live in the FIRST posting blocks /
  parquet row groups (min/max pruning = the early-termination
  analog). A sort-field range predicate maps to a docID range, which
  :func:`lucene_spark.search.positional.decode_positions`-style
  block pruning and parquet row-group stats both exploit.

The original docID survives as ``orig_doc_id`` (Lucene's old-to-new
docID map held by the Sorter) so results translate back.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F, Window

__all__ = ["sort_docs"]


def sort_docs(
    corpus: DataFrame,
    sort_cols: Sequence[Union[str, Column]],
    doc_id_col: str = "doc_id",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Reassign contiguous docIDs 0..n-1 in `sort_cols` order.

    Returns the corpus with `doc_id_col` replaced by the sort-order
    rank and the previous id kept as ``orig_doc_id``. Ties should be
    broken by including the old id as the last sort key for
    determinism. The returned frame is range-partitioned by the sort
    key with contiguous docID ranges per partition — exactly the
    ``layout='aligned'`` ingest contract of
    :meth:`lucene_spark.index.InvertedIndex.build`, so the subsequent
    build needs NO further shuffle.
    """
    cols: List[Column] = [F.col(c) if isinstance(c, str) else c for c in sort_cols]
    spark = corpus.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism

    parts = (
        corpus.withColumnRenamed(doc_id_col, "orig_doc_id")
        .repartitionByRange(n_part, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # per-partition counts -> driver cumsum (one row per partition)
    counts = {
        r["_pid"]: r["cnt"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    ranked = (
        parts.withColumn("_rn", F.row_number().over(w))
        .join(off_df, "_pid")
        .withColumn(doc_id_col, (F.col("_off") + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn", "_off")
    )
    return ranked
