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

import json
import os
from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, Window

__all__ = [
    "sort_docs",
    "save_sorted",
    "early_terminated_topk",
    "sorted_range_query",
]


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


def save_sorted(
    sorted_df: DataFrame,
    path: str,
    doc_id_col: str = "doc_id",
    docs_per_segment: int = 65_536,
    stats_cols: Optional[Sequence[str]] = None,
) -> None:
    """Persist a :func:`sort_docs` output as a segment-partitioned
    sorted store.

    Each ``seg = doc_id // docs_per_segment`` becomes a Hive partition
    directory holding one contiguous docID range — the on-disk shape
    of Lucene's index-sorted segments (`index/Sorter.java:34` applies
    the sort at flush; each segment's docIDs then follow the sort
    order). Partition values are the *coarse* sort positions, so a
    docID bound turns into PARTITION pruning (whole directories never
    listed into the scan) plus row-group min/max pruning inside the
    boundary segment. A tiny JSON manifest records the layout and,
    when `stats_cols` is given, per-segment min/max of those columns —
    the per-leaf sort bounds `IndexSortSortedNumericDocValuesRangeQuery`
    binary-searches against (`search/IndexSortSortedNumericDocValues
    RangeQuery.java:69`), queryable driver-side without touching data.
    """
    n_docs = sorted_df.count()
    seg = (F.col(doc_id_col) / docs_per_segment).cast("long").alias("seg")
    with_seg = sorted_df.withColumn("seg", seg)
    (
        with_seg.repartition("seg")
        .sortWithinPartitions(doc_id_col)
        .write.mode("overwrite")
        .partitionBy("seg")
        .parquet(path)
    )
    meta = {
        "doc_id_col": doc_id_col,
        "docs_per_segment": int(docs_per_segment),
        "n_docs": int(n_docs),
    }
    if stats_cols:
        aggs = []
        for c in stats_cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        stats = {
            int(r["seg"]): {
                c: [r[f"min_{c}"], r[f"max_{c}"]] for c in stats_cols
            }
            for r in with_seg.groupBy("seg").agg(*aggs).collect()
        }
        meta["seg_stats"] = {str(k): v for k, v in sorted(stats.items())}
    with open(os.path.join(path, "_sorted_meta.json"), "w") as f:
        json.dump(meta, f)


def early_terminated_topk(
    spark: SparkSession,
    path: str,
    k: int,
    deleted: Optional[DataFrame] = None,
) -> DataFrame:
    """Top-k in index-sort order with early termination.

    The analog of `TopFieldCollector.canEarlyTerminate`
    (`search/TopFieldCollector.java:147`): when the query sort is a
    prefix of the index sort (or docID order itself), Lucene stops
    collecting after k competitive hits per segment instead of scoring
    the segment to its end. Distributed, "stop reading early" becomes
    "never read at all": because :func:`sort_docs` made docID *equal*
    to the sort rank, the global top-k is exactly ``doc_id < bound``,
    and the bound becomes

    - a PartitionFilter on ``seg`` — segments past the boundary are
      pruned from the file listing (never opened, the distributed
      early termination), and
    - a PushedFilter on ``doc_id`` — row groups inside the boundary
      segment prune on parquet min/max stats.

    With tombstones (`deleted`: frame with the doc_id column), the
    bound widens by the deleted count inside the prefix — the
    iteration is Lucene's "collect until k *live* competitive hits",
    run as a driver fixpoint over tiny aggregate counts (at most a few
    rounds, each one COUNT over the small tombstone frame; the corpus
    itself is never touched until the final pruned scan).
    """
    with open(os.path.join(path, "_sorted_meta.json")) as f:
        meta = json.load(f)
    doc_id_col = meta["doc_id_col"]
    dps = int(meta["docs_per_segment"])
    n_docs = int(meta["n_docs"])

    bound = min(k, n_docs)
    if deleted is not None:
        while True:
            d = deleted.filter(F.col(doc_id_col) < bound).count()
            new_bound = min(k + d, n_docs)
            if new_bound == bound:
                break
            bound = new_bound

    df = spark.read.parquet(path)
    out = df.filter(
        (F.col("seg") <= (max(bound, 1) - 1) // dps)
        & (F.col(doc_id_col) < bound)
    )
    if deleted is not None:
        out = out.join(
            F.broadcast(deleted.select(doc_id_col)), doc_id_col, "left_anti"
        )
    return out.orderBy(doc_id_col).limit(k).drop("seg")


def sorted_range_query(
    spark: SparkSession,
    path: str,
    field: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Range query on the index-sort field with segment binary search.

    The analog of `IndexSortSortedNumericDocValuesRangeQuery`
    (`search/IndexSortSortedNumericDocValuesRangeQuery.java:69`): when
    the index is sorted on the queried field, the matching docs are a
    CONTIGUOUS docID range, found by binary search on the sort values
    instead of a points/terms structure. Distributed, the binary
    search becomes a driver-side scan of the manifest's per-segment
    (min, max) sort bounds (`save_sorted(stats_cols=[field])`): only
    segments whose bounds overlap [lo, hi] enter the scan — a
    PartitionFilter, so non-overlapping segment directories are never
    opened — and the exact predicate pushes into parquet for row-group
    pruning inside the boundary segments. Bounds are inclusive;
    ``None`` means unbounded (the reference's missing-bound rewrite).
    A store saved without stats falls back to the full pushed-predicate
    scan (still correct, no segment pruning).
    """
    with open(os.path.join(path, "_sorted_meta.json")) as f:
        meta = json.load(f)
    df = spark.read.parquet(path)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(field) >= lo)
    if hi is not None:
        pred = pred & (F.col(field) <= hi)

    stats = meta.get("seg_stats") or {}
    if stats and all(field in v for v in stats.values()):
        keep = [
            int(s)
            for s, v in stats.items()
            if (hi is None or v[field][0] <= hi)
            and (lo is None or v[field][1] >= lo)
        ]
        if not keep:
            return df.filter(F.lit(False)).drop("seg")
        # contiguous rank ranges: overlapping segments form an interval,
        # so the partition filter is a BETWEEN, not a long IN list
        df = df.filter(F.col("seg").between(min(keep), max(keep)))
    return df.filter(pred).drop("seg")
