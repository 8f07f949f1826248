"""Date-range indexing analogs of the reference's spatial-extras
NumberRangePrefixTreeStrategy + DateRangePrefixTree
(`spatial-extras/src/java/org/apache/lucene/spatial/prefix/
NumberRangePrefixTreeStrategy.java:38`, `spatial/prefix/tree/
DateRangePrefixTree.java:52`).

The reference indexes per-document DATE RANGES as truncated calendar
cells (year → month → day → …) in a prefix tree, supports relation
queries (INTERSECTS / WITHIN / CONTAINS / DISJOINT) against a query
interval, and calendar-bucket faceting (`Facets` on the tree level =
how many indexed ranges touch each year/month/day cell).

Spark-first shape: a range is just (start timestamp, end timestamp)
columns — Catalyst's min/max parquet pushdown plays the role of the
tree's coarse levels, so relation queries stay a pure `filter` that
prunes row groups. Faceting expands each range into its covered
calendar cells with `sequence()` (bounded by the range's cell count,
not the table size) and partial-aggregates — the same map-side-combine
shape the tree's per-cell counts have.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "date_range_relation",
    "date_range_facet_counts",
    "LEVELS",
]

# calendar levels the reference tree exposes (DateRangePrefixTree
# supports down to millis; sub-day levels are rarely faceted)
LEVELS = {"year": "interval 1 year", "month": "interval 1 month",
          "day": "interval 1 day", "hour": "interval 1 hour"}


def date_range_relation(
    start: Column,
    end: Column,
    q_start,
    q_end,
    relation: str = "intersects",
) -> Column:
    """Relation predicate of an indexed range [start, end] (inclusive)
    vs the query interval [q_start, q_end] (inclusive), matching
    SpatialOperation Intersects/IsWithin/Contains/IsDisjointTo."""
    qs, qe = F.lit(q_start), F.lit(q_end)
    rel = relation.lower()
    if rel == "intersects":
        return (start <= qe) & (end >= qs)
    if rel == "within":
        return (start >= qs) & (end <= qe)
    if rel == "contains":
        return (start <= qs) & (end >= qe)
    if rel == "disjoint":
        return (start > qe) | (end < qs)
    raise ValueError(f"unknown relation {relation!r}")


def date_range_facet_counts(
    df: DataFrame,
    start_col: str,
    end_col: str,
    level: str = "day",
) -> DataFrame:
    """Per-calendar-cell counts of ranges touching each cell — the
    NumberRangePrefixTreeStrategy.facets analog at one tree level.

    Each range expands to its covered cells via ``sequence`` (a row
    multiplies only by its own cell span), then one partial-agg'd
    groupBy. Cells no range touches are absent, exactly like the
    tree's sparse per-cell counts."""
    if level not in LEVELS:
        raise ValueError(f"unknown level {level!r} (have {sorted(LEVELS)})")
    step = F.expr(LEVELS[level])
    cells = F.sequence(
        F.date_trunc(level, F.col(start_col)),
        F.date_trunc(level, F.col(end_col)),
        step,
    )
    return (
        df.select(F.explode(cells).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )
