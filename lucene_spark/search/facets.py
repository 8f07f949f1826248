"""Hierarchical (taxonomy) facets.

`facet/src/java/org/apache/lucene/facet/taxonomy/TaxonomyFacetIntAssociations.java`
and `FastTaxonomyFacetCounts` count, for a match set, the child
categories directly under a given path of a hierarchical dimension
(e.g. Location=Europe/France/Paris), supporting getTopChildren +
drill-down. Lucene materializes the hierarchy in a side-car taxonomy
index mapping paths to ordinals; the Spark re-expression needs no
side-car — the path is a column, prefix predicates replace ordinal
lookups, and counts are partial-aggregated ``groupBy`` over the next
path component:

- child counts = filter rows under the path prefix, group by the next
  component — one partial-agg shuffle, skew-safe (category cardinality
  is tiny relative to docs);
- drill-down = a prefix predicate, pushable to the scan when the table
  is partitioned by the leading component(s) — Hive/Iceberg-style
  partition directories ARE a materialized taxonomy level, so
  drill-down prunes files exactly like the taxonomy index prunes
  ordinals.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "taxonomy_children",
    "drill_down",
    "association_children",
    "long_range_counts",
    "sampled_facet_counts",
    "string_value_facet_counts",
    "long_value_facet_counts",
    "range_on_range_counts",
]

_SEP = "/"


def _parts(path_col: str):
    return F.split(F.col(path_col), _SEP)


def drill_down(df: DataFrame, path_col: str, path: Sequence[str]) -> DataFrame:
    """Rows whose `path_col` lies under `path` (DrillDownQuery on a
    hierarchical dimension): component-wise prefix match."""
    parts = _parts(path_col)
    cond = F.lit(True)
    for i, comp in enumerate(path):
        # F.get: NULL (not an error) past the end — short paths filter out
        cond = cond & (F.get(parts, i) == comp)
    return df.filter(cond)


def taxonomy_children(
    df: DataFrame,
    path_col: str,
    path: Sequence[str] = (),
    top_n: int | None = None,
) -> DataFrame:
    """(child, cnt) for categories directly under `path`
    (`FacetsCollector` + `getTopChildren`): count desc, child asc,
    optionally limited to top_n."""
    depth = len(path)
    parts = _parts(path_col)
    children = (
        drill_down(df, path_col, path)
        .filter(F.size(parts) > depth)
        .groupBy(F.get(parts, depth).alias("child"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("child").asc())
    )
    return children.limit(top_n) if top_n is not None else children


def association_children(
    df: DataFrame,
    path_col: str,
    value_col: str,
    path: Sequence[str] = (),
    agg: str = "sum",
    top_n: int | None = None,
) -> DataFrame:
    """Association facets
    (`facet/taxonomy/FloatAssociationFacetField.java:30`,
    `TaxonomyFacetFloatAssociations.java` with
    `AssociationAggregationFunction.SUM`/`MAX`): each doc carries a
    per-category VALUE (not just presence), and getTopChildren ranks
    the children under `path` by the aggregated association instead of
    the count. Same single partial-agg'd groupBy as
    :func:`taxonomy_children`, one extra aggregated column. Returns
    (child, assoc, cnt), assoc desc / child asc."""
    if agg not in ("sum", "max"):
        raise ValueError("agg must be 'sum' or 'max' (the reference's functions)")
    depth = len(path)
    parts = _parts(path_col)
    fn = F.sum if agg == "sum" else F.max
    children = (
        drill_down(df, path_col, path)
        .filter(F.size(parts) > depth)
        .groupBy(F.get(parts, depth).alias("child"))
        .agg(
            fn(F.col(value_col).cast("double")).alias("assoc"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy(F.col("assoc").desc(), F.col("child").asc())
    )
    return children.limit(top_n) if top_n is not None else children


def long_range_counts(
    df: DataFrame,
    value_col: str,
    ranges: Sequence[tuple],
) -> DataFrame:
    """LongRangeFacetCounts (`facet/range/LongRangeFacetCounts.java:47`,
    `facet/range/LongRange.java:24`): counts for ARBITRARY, possibly
    overlapping ranges — unlike a histogram, one doc can land in
    several ranges, so this is NOT a groupBy on a bucket key.

    Each range is ``(label, lo, hi)`` or
    ``(label, lo, lo_incl, hi, hi_incl)`` matching LongRange's explicit
    inclusiveness flags (3-tuples default to ``[lo, hi)``).

    Plan shape: ONE conditional-sum aggregate over a single scan (a
    ``sum(CASE WHEN ...)`` per range), then an explode of the 1×R
    result row into (label, cnt) rows — no per-range scan, no shuffle
    beyond the final partial-agg'd reduce, overlap-safe. Returns
    (label, cnt) in the given range order.
    """
    conds = []
    labels = []
    for r in ranges:
        if len(r) == 3:
            label, lo, hi = r
            lo_incl, hi_incl = True, False
        else:
            label, lo, lo_incl, hi, hi_incl = r
        v = F.col(value_col)
        c = (v >= F.lit(lo)) if lo_incl else (v > F.lit(lo))
        c = c & ((v <= F.lit(hi)) if hi_incl else (v < F.lit(hi)))
        labels.append(label)
        conds.append(
            F.sum(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"_r{len(conds)}")
        )
    one = df.agg(*conds)
    pairs = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("label"),
                F.col(f"_r{i}").cast("long").alias("cnt"),
            )
            for i, lbl in enumerate(labels)
        ]
    )
    return one.select(F.explode(pairs).alias("p")).select("p.label", "p.cnt")


def histogram_counts(
    df: DataFrame,
    value_col: str,
    bucket_width: int,
    max_buckets: int = 1024,
) -> DataFrame:
    """HistogramCollector analog
    (`sandbox/facet/plain/histograms/HistogramCollector.java:52`,
    `HistogramCollectorManager.java:38`): fixed-width value histogram,
    bucket = floorDiv(value, bucketWidth) with Java's floor semantics
    for negative values, hard ``maxBuckets`` cap (the reference throws
    IllegalStateException past the cap).

    Scale notes: ONE partial-agg'd groupBy on the bucket key — the
    reference's PointTreeBulkCollector trick (count whole BKD subtrees
    that fall inside one bucket without visiting docs) is what parquet
    row-group pruning + partial aggregation already give this plan: the
    scan never materializes more than (bucket, partial count) pairs per
    task, and a sorted/partitioned value column prunes row groups the
    filter excludes.  The cap check is one tiny count, not a collect of
    the histogram.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    bucket = F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist = hist.persist()  # cap check + downstream read: one scan total
    n = hist.count()
    if n > max_buckets:
        hist.unpersist()
        raise ValueError(
            f"{n} buckets exceed maxBuckets={max_buckets} "
            "(HistogramCollector.java cap semantics)"
        )
    return hist.orderBy("bucket")


def sampled_facet_counts(
    df: DataFrame,
    facet_col: str,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """RandomSamplingFacetsCollector
    (`facet/RandomSamplingFacetsCollector.java:46`): facet counts over
    a SAMPLE of the hit set, scaled back by the inverse sampling rate
    (``amortizeFacetCounts``). The reference samples to bound
    collection cost on huge hit sets; here the deterministic md5-bucket
    sample (`pipeline/sampling.py` — partition-independent and
    engine-reproducible) bounds the shuffle input the same way, and the
    scan-side filter means only ~fraction of rows reach the groupBy.
    Returns (label, cnt_sampled, cnt_est), label asc."""
    from lucene_spark.pipeline.sampling import hash_sample

    sampled = hash_sample(df, fraction, key_col, seed)
    return (
        sampled.groupBy(F.col(facet_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("cnt_sampled"))
        .select(
            "label",
            "cnt_sampled",
            F.round(F.col("cnt_sampled") / F.lit(float(fraction)), 4).alias(
                "cnt_est"
            ),
        )
        .orderBy("label")
    )


def dynamic_range_facets(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    top_n: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Equi-weight dynamic ranges
    (`facet/range/DynamicRangeUtil.java:204`
    ``computeDynamicNumericRanges``): sort (value, weight) pairs by
    value (weight tie-break), then greedily cut a range every time the
    accumulated weight reaches ``totalWeight / min(topN, len)``,
    emitting (count, weight, min, max, centroid) per range; a trailing
    partial range captures the leftovers (:257-262). Zero weights are
    skipped (:159-163).

    Distributed shape (the reference collects all values into one
    array — a non-starter at 100 TB): range-repartition + in-partition
    sort gives the global (value, weight) order without a single-task
    sort; per-partition weight totals (one small agg, P rows to the
    driver) turn in-partition running sums into global running sums —
    the pack_sequences cumsum pattern. The greedy cut positions are
    then found with ≤ top_n scalar aggregations over the cached cumsum
    (each "first row where cumWeight - base >= target" is a
    distributed min — the sequential scan's only data dependence is
    the previous cut, so top_n small jobs replace the driver-side
    array walk; top_n is single digits in practice). Bucket assignment
    is a broadcast when-chain, and the final per-range stats are one
    partial-agg'd groupBy. Ties in (value, weight) make row order
    ambiguous, but every range boundary lies at a cumulative-weight
    threshold, so the bucket CONTENTS (as multisets) are
    order-invariant — the aggregates are deterministic.

    Returns (bucket, cnt, weight, min_v, max_v, centroid), bucket asc;
    centroid = sum(value)/count computed from exact integer sums
    (DynamicRangeInfo.centroid, :276).
    """
    spark = df.sparkSession
    src = (
        df.select(
            F.col(value_col).cast("long").alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .filter(F.col("w") > 0)
    )
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    parts = (
        src.repartitionByRange(n_part, F.col("v"), F.col("w"))
        .sortWithinPartitions("v", "w")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        per_pid = {
            r["_pid"]: (r["tw"], r["cnt"])
            for r in parts.groupBy("_pid")
            .agg(F.sum("w").alias("tw"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        total_w = sum(tw for tw, _ in per_pid.values())
        n = sum(c for _, c in per_pid.values())
        empty = spark.createDataFrame(
            [],
            "bucket int, cnt long, weight long, min_v long, max_v long,"
            " centroid double",
        )
        if n == 0 or top_n <= 0:
            return empty
        target = float(total_w) / min(top_n, n)
        woff, coff, aw, ac = {}, {}, 0, 0
        for pid in sorted(per_pid):
            woff[pid], coff[pid] = aw, ac
            aw += per_pid[pid][0]
            ac += per_pid[pid][1]
        off = F.broadcast(
            spark.createDataFrame(
                [(int(p), int(woff[p]), int(coff[p])) for p in per_pid],
                "_pid int, _woff long, _coff long",
            )
        )
        win = Window.partitionBy("_pid").orderBy("v", "w")
        cum = (
            parts.withColumn(
                "_cw",
                F.sum("w").over(
                    win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .withColumn("_rn", F.row_number().over(win))
            .join(off, "_pid")
            .select(
                "v",
                "w",
                (F.col("_rn") + F.col("_coff")).alias("rn"),
                (F.col("_cw") + F.col("_woff")).alias("cw"),
            )
            .persist()
        )
        try:
            cum.count()  # materialize once before the boundary probes
            # greedy cut positions: rn of each range's last element
            bounds = [0]
            base = 0  # cw at the previous cut
            while bounds[-1] < n and len(bounds) <= top_n:
                hit = (
                    cum.filter((F.col("cw") - F.lit(base)) >= F.lit(target))
                    .orderBy("rn")
                    .limit(1)
                    .collect()
                )
                if not hit:
                    bounds.append(n)  # trailing partial range
                else:
                    bounds.append(int(hit[0]["rn"]))
                    base = int(hit[0]["cw"])
            if bounds[-1] < n:
                bounds.append(n)  # defensive: trailing rows form a range
            bucket = F.lit(0)
            for b in bounds[1:-1]:
                bucket = bucket + (F.col("rn") > F.lit(b)).cast("int")
            return (
                cum.withColumn("bucket", bucket)
                .groupBy("bucket")
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum("w").alias("weight"),
                    F.min("v").alias("min_v"),
                    F.max("v").alias("max_v"),
                    (F.sum("v") * F.lit(1.0) / F.count(F.lit(1))).alias(
                        "centroid"
                    ),
                )
                .orderBy("bucket")
            ).localCheckpoint()
        finally:
            cum.unpersist()
    finally:
        parts.unpersist()


def string_value_facet_counts(
    df: DataFrame,
    values_col: str,
    top_n: int = 10,
    doc_col: str = "doc_id",
) -> DataFrame:
    """StringValueFacetCounts (`facet/StringValueFacetCounts.java:176`):
    taxonomy-free faceting directly over a doc-values field. A
    multi-valued doc counts once per DISTINCT value; ``totalDocCount``
    is the number of docs with at least one value; ``childCount`` is
    the number of distinct labels with a non-zero count; top-N is
    ordered count desc with ties broken by label asc (the
    TopOrdAndIntQueue ord ordering).

    Spark re-expression: explode-distinct to (doc, label) pairs, one
    partial-agg'd groupBy for the per-label counts, and one scalar
    aggregate row broadcast onto the top-N result for the
    totalDocCount/childCount header fields. Label cardinality bounds
    reducer state; the corpus shuffles only narrow (doc, label) pairs.

    ``values_col`` may be a scalar string column or an array column
    (the SortedSetDocValues multi-valued shape)."""
    col = F.col(values_col)
    dt = dict(df.dtypes).get(values_col, "string")
    if dt.startswith("array"):
        pairs = df.select(
            F.col(doc_col).alias("_doc"),
            F.explode(F.array_distinct(col)).alias("label"),
        )
        with_val = df.filter(F.size(col) > 0)
    else:
        pairs = df.filter(col.isNotNull()).select(
            F.col(doc_col).alias("_doc"), col.alias("label")
        )
        with_val = df.filter(col.isNotNull())
    counts = pairs.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    header = counts.agg(
        F.count(F.lit(1)).cast("long").alias("child_count")
    ).crossJoin(with_val.agg(F.count(F.lit(1)).cast("long").alias("total_docs")))
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("label").asc())
        .limit(top_n)
        .crossJoin(F.broadcast(header))
        .select("label", F.col("cnt").cast("long").alias("cnt"),
                "total_docs", "child_count")
        .orderBy(F.col("cnt").desc(), F.col("label").asc())
    )


def long_value_facet_counts(
    df: DataFrame,
    value_col: str,
    top_n: int = 10,
) -> DataFrame:
    """LongValueFacetCounts (`facet/LongValueFacetCounts.java:413`):
    value-source faceting over a long column — top-N by count desc,
    ties by value ASC (the reference's explicit comparator), label is
    the decimal string of the value, plus the totCount/childCount
    header fields. Same one-groupBy plan as the string variant."""
    v = F.col(value_col)
    pairs = df.filter(v.isNotNull()).select(v.cast("long").alias("value"))
    counts = pairs.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    header = counts.agg(
        F.count(F.lit(1)).cast("long").alias("child_count"),
        F.sum("cnt").cast("long").alias("total_docs"),
    )
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("value").asc())
        .limit(top_n)
        .crossJoin(F.broadcast(header))
        .select(
            F.col("value").cast("string").alias("label"),
            F.col("cnt").cast("long").alias("cnt"),
            "total_docs",
            "child_count",
        )
        .orderBy(F.col("cnt").desc(), F.col("label").asc())
    )


def range_on_range_counts(
    df: DataFrame,
    min_col: str,
    max_col: str,
    ranges: Sequence[tuple],
    relation: str = "intersects",
) -> DataFrame:
    """RangeOnRangeFacetCounts (`facet/rangeonrange/
    RangeOnRangeFacetCounts.java:35`, Long/DoubleRangeOnRangeFacetCounts):
    the doc field is itself a range ``[min_col, max_col]`` and each
    labelled facet bucket is a query range counted under a
    RangeFieldQuery.QueryType relation (INTERSECTS / WITHIN /
    CONTAINS / CROSSES). Ranges may overlap, so like
    ``long_range_counts`` this is one conditional-sum aggregate over a
    single scan — never a groupBy on a bucket key, never a per-range
    scan. Also emits the reference's ``totCount`` header (docs with a
    value) on every row. ``ranges`` is (label, lo, hi), both inclusive
    (the rangeonrange encoding is closed on both ends)."""
    from lucene_spark.search.rangefield import range_relation_cond

    rmin, rmax = F.col(min_col), F.col(max_col)
    has = rmin.isNotNull() & rmax.isNotNull()
    aggs = [
        F.sum(F.when(has, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("_tot")
    ]
    labels = []
    for label, lo, hi in ranges:
        cond = has & range_relation_cond(rmin, rmax, lo, hi, relation)
        aggs.append(
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"_r{len(labels)}")
        )
        labels.append(label)
    one = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("label"),
                F.col(f"_r{i}").alias("cnt"),
            )
            for i, lbl in enumerate(labels)
        ]
    )
    return one.select(F.explode(pairs).alias("p"), F.col("_tot")).select(
        "p.label", "p.cnt", F.col("_tot").alias("total_docs")
    )
