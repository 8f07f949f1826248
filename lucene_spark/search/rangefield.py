"""Range fields: queries over indexed (min, max) interval columns.

Re-expression of Lucene's range-field family
(`lucene/core/src/java/org/apache/lucene/document/IntRange.java:48`,
`LongRange.java`, `DoubleRange.java`, queried through
`document/RangeFieldQuery.java:41-79`): a document stores an interval
per dimension and queries relate it to a query interval with one of
four relations (`RangeFieldQuery.QueryType`):

- **INTERSECTS**: doc.min <= q.max AND doc.max >= q.min
- **WITHIN**: q.min <= doc.min AND doc.max <= q.max
- **CONTAINS**: doc.min <= q.min AND q.max <= doc.max
- **CROSSES**: intersects but neither within nor contains
  (`RangeFieldQuery.java` QueryType.CROSSES: INTERSECTS ∧ ¬WITHIN ∧
  ¬CONTAINS)

The reference answers these from a BKD tree over the 2·dims packed
values; the Spark-native equivalent is two plain comparable columns —
each relation is a conjunction of simple column/literal comparisons,
so Catalyst pushes the whole predicate into the parquet scan
(min/max row-group pruning on BOTH columns), which is the same
coarse-prune + refine shape as BKD inner-node culling. No UDF, no
shuffle; at 100 TB the scan prunes row groups whose [min(min_col),
max(min_col)] × [min(max_col), max(max_col)] stats exclude the
relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "range_relation_cond",
    "range_query",
    "range_relation_cond_multi",
    "range_query_multi",
    "multi_range_match",
    "dv_multi_range_match",
    "point_nearest",
    "RELATIONS",
]

RELATIONS = ("intersects", "within", "contains", "crosses")


def range_relation_cond(
    min_col: Column, max_col: Column, lo, hi, relation: str
) -> Column:
    """Boolean Column implementing one RangeFieldQuery.QueryType
    relation between the stored interval [min_col, max_col] and the
    query interval [lo, hi] (both closed, as in the reference)."""
    lo, hi = F.lit(lo), F.lit(hi)
    intersects = (min_col <= hi) & (max_col >= lo)
    within = (lo <= min_col) & (max_col <= hi)
    contains = (min_col <= lo) & (hi <= max_col)
    if relation == "intersects":
        return intersects
    if relation == "within":
        return within
    if relation == "contains":
        return contains
    if relation == "crosses":
        # RangeFieldQuery.QueryType.CROSSES.matches (RangeFieldQuery.java:268):
        # INTERSECTS && !WITHIN — a stored range that CONTAINS the
        # query still crosses it in the reference's semantics
        return intersects & ~within
    raise ValueError(f"unknown range relation {relation!r}; use one of {RELATIONS}")


def range_query(
    df: DataFrame,
    min_col: str,
    max_col: str,
    lo,
    hi,
    relation: str = "intersects",
) -> DataFrame:
    """Rows of `df` whose stored range [min_col, max_col] stands in
    `relation` to the query range [lo, hi]."""
    return df.filter(
        range_relation_cond(F.col(min_col), F.col(max_col), lo, hi, relation)
    )


def _all(conds) -> Column:
    out = None
    for c in conds:
        out = c if out is None else out & c
    return out


def range_relation_cond_multi(dims, relation: str) -> Column:
    """Multi-dimensional relation (IntRange supports up to 4 dims —
    `document/IntRange.java:48`; `RangeFieldQuery.java` relates every
    dimension): ``dims`` = [(min_col_name, max_col_name, lo, hi), ...].

    Per the reference's per-dim tests: INTERSECTS/WITHIN/CONTAINS hold
    iff they hold on EVERY dimension; CROSSES (`RangeFieldQuery.java:268`)
    = intersects in all dims AND NOT within overall (a stored box that
    contains the query box still crosses it)."""
    cols = [(F.col(a), F.col(b), lo, hi) for a, b, lo, hi in dims]
    inter = _all(range_relation_cond(a, b, lo, hi, "intersects") for a, b, lo, hi in cols)
    within = _all(range_relation_cond(a, b, lo, hi, "within") for a, b, lo, hi in cols)
    contains = _all(range_relation_cond(a, b, lo, hi, "contains") for a, b, lo, hi in cols)
    if relation == "intersects":
        return inter
    if relation == "within":
        return within
    if relation == "contains":
        return contains
    if relation == "crosses":
        return inter & ~within
    raise ValueError(f"unknown range relation {relation!r}; use one of {RELATIONS}")


def range_query_multi(df: DataFrame, dims, relation: str = "intersects") -> DataFrame:
    """Rows whose multi-dim stored range stands in `relation` to the
    query hyper-rectangle."""
    return df.filter(range_relation_cond_multi(dims, relation))


def dv_multi_range_match(df: DataFrame, values_col: str, ranges) -> DataFrame:
    """SortedNumericDocValuesMultiRangeQuery
    (`lucene/sandbox/.../search/SortedNumericDocValuesMultiRangeQuery.java:42`,
    and the SortedSet variant for term values): docs where ANY of the
    doc's MULTIPLE values falls in ANY [lo, hi] range. The multi-value
    column is an array; the predicate is one codegen'd ``exists`` over
    it — single scan, constant score, no explode (no row blow-up on
    wide docs)."""
    if not ranges:
        return df.filter(F.lit(False))

    def any_range(v):
        cond = None
        for lo, hi in ranges:
            c = (v >= F.lit(lo)) & (v <= F.lit(hi))
            cond = c if cond is None else (cond | c)
        return cond

    return df.filter(F.exists(F.col(values_col), any_range))


def point_nearest(
    df: DataFrame,
    value_cols,
    origin,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """FloatPointNearestNeighbor
    (`lucene/sandbox/.../document/FloatPointNearestNeighbor.java:38`):
    k nearest docs to `origin` in n-dim point space by squared
    Euclidean distance, ties by id. The reference prunes BKD cells by
    best-so-far distance; the Spark physical analog is parquet min/max
    pruning on the point columns plus TakeOrderedAndProject (bounded
    per-partition heaps, no global sort)."""
    cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    orig = [origin] if isinstance(origin, (int, float)) else list(origin)
    if len(cols) != len(orig):
        raise ValueError("value_cols and origin dims differ")
    dist = None
    for c, o in zip(cols, orig):
        d = (F.col(c) - F.lit(float(o))) * (F.col(c) - F.lit(float(o)))
        dist = d if dist is None else (dist + d)
    return (
        df.select(F.col(id_col), dist.alias("dist_sq"))
        .orderBy(F.col("dist_sq").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("dist_sq", 6).alias("dist_sq"))
    )


def multi_range_match(df: DataFrame, value_col: str, ranges) -> DataFrame:
    """MultiRangeQuery
    (`lucene/sandbox/src/java/org/apache/lucene/sandbox/search/MultiRangeQuery.java:57`):
    docs whose point value falls in ANY of the [lo, hi] ranges
    (inclusive), matched in ONE scan — the reference merges the ranges
    into a single point-tree visitor for the same reason this emits one
    OR'd codegen predicate instead of R scans. Constant score."""
    if not ranges:
        return df.filter(F.lit(False))
    cond = None
    for lo, hi in ranges:
        c = F.col(value_col).between(F.lit(lo), F.lit(hi))
        cond = c if cond is None else (cond | c)
    return df.filter(cond)
