"""FacetSets: multi-dimension facet-set matching and counting.

Re-expresses the reference's `facet/facetset` module
(FacetSetsField.java, ExactFacetSetMatcher.java:27,
RangeFacetSetMatcher.java:27, DimRange.java:28,
MatchingFacetSetsCounts.java:41): documents carry a multivalued field
of N-dimensional long tuples ("facet sets" — e.g. (genre, year) or
(quantity, month) pairs), and matchers count how often each pattern
occurs.

Reference counting semantics, reproduced exactly
(MatchingFacetSetsCounts.java:124-135):

- a matcher's count increments once per MATCHING SET, so a document
  holding two sets that both match contributes 2;
- the total counts DOCUMENTS that have at least one set matching at
  least one matcher.

Spark shape: the sets column is ``array<array<bigint>>``. Matching is
evaluated with ``F.filter``/``F.size`` higher-order functions inside
ONE narrow projection (no explode — the row count never multiplies),
followed by a single partial-aggregated global sum. At 100 TB this is
a pure map-side scan + one tiny shuffle of per-partition partial sums;
adding matchers adds columns, not rows or stages.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dim_range",
    "exact_matcher",
    "range_matcher",
    "matching_facet_sets_counts",
]

_LONG_MIN = -(1 << 63)
_LONG_MAX = (1 << 63) - 1


def dim_range(
    min_val: int,
    max_val: int,
    min_inclusive: bool = True,
    max_inclusive: bool = True,
) -> Tuple[int, int]:
    """DimRange.fromLongs (DimRange.java:33): half-open bounds fold to
    the inclusive [min, max] pair the matcher uses."""
    if not min_inclusive:
        if min_val == _LONG_MAX:
            raise ValueError(f"Invalid min input: {min_val}")
        min_val += 1
    if not max_inclusive:
        if max_val == _LONG_MIN:
            raise ValueError(f"Invalid max input: {max_val}")
        max_val -= 1
    if min_val > max_val:
        raise ValueError(
            f"Minimum cannot be greater than maximum, max={max_val}, "
            f"min={min_val}"
        )
    return (min_val, max_val)


def exact_matcher(label: str, values: Sequence[int]):
    """ExactFacetSetMatcher.java:38: every dimension equal."""
    values = [int(v) for v in values]

    def _pred(s: Column) -> Column:
        cond = F.size(s) == len(values)
        for i, v in enumerate(values):
            cond = cond & (s[i] == F.lit(v))
        return cond

    return (label, _pred)


def range_matcher(label: str, ranges: Sequence[Tuple[int, int]]):
    """RangeFacetSetMatcher.java:41: every dimension inside its
    inclusive [min, max] range."""
    ranges = [(int(lo), int(hi)) for lo, hi in ranges]

    def _pred(s: Column) -> Column:
        cond = F.size(s) == len(ranges)
        for i, (lo, hi) in enumerate(ranges):
            cond = cond & (s[i] >= F.lit(lo)) & (s[i] <= F.lit(hi))
        return cond

    return (label, _pred)


def matching_facet_sets_counts(
    df: DataFrame,
    sets_col: str,
    matchers: List,
    total_label: str = "__total__",
) -> DataFrame:
    """MatchingFacetSetsCounts.java:89 count(): one row per matcher
    label with its per-set match count, plus a ``total_label`` row
    counting documents with ≥ 1 matching set.

    Single narrow projection (per-matcher `size(filter(sets, pred))`)
    + one global partial-agg'd sum — no explode, no per-doc shuffle.
    """
    if not matchers:
        raise ValueError("at least one matcher is required")
    proj = []
    any_match = F.lit(False)
    for idx, (label, pred) in enumerate(matchers):
        cnt = F.size(F.filter(F.col(sets_col), pred))
        proj.append(cnt.alias(f"_m{idx}"))
        any_match = any_match | (cnt > 0)
    proj.append(any_match.cast("long").alias("_any"))

    agg = df.select(*proj).agg(
        *[F.sum(f"_m{i}").alias(f"_s{i}") for i in range(len(matchers))],
        F.sum("_any").alias("_tot"),
    )

    rows = None
    for idx, (label, _) in enumerate(matchers):
        r = agg.select(
            F.lit(label).alias("label"),
            F.coalesce(F.col(f"_s{idx}"), F.lit(0)).alias("cnt"),
        )
        rows = r if rows is None else rows.unionByName(r)
    rows = rows.unionByName(
        agg.select(
            F.lit(total_label).alias("label"),
            F.coalesce(F.col("_tot"), F.lit(0)).alias("cnt"),
        )
    )
    return rows
