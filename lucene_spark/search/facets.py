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

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "taxonomy_children",
    "drill_down",
    "association_children",
    "long_range_counts",
    "sampled_facet_counts",
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
