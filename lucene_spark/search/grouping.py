"""Grouping-module completion: the collectors beyond collapse/top-groups.

Lucene's grouping module (`lucene/grouping/src/java/org/apache/lucene/
search/grouping/`) has, beyond the FirstPass/SecondPass top-groups
shape already covered by `collapse.py` and the `group_top2_per_lang`
gate, a family of whole-match-set collectors:

- `AllGroupsCollector.java:33` — every distinct group value in the
  match set (`getGroupCount` / `getGroups`).
- `AllGroupHeadsCollector.java:41` — for EVERY group, the single most
  competitive document under a within-group sort (not truncated to
  top-N groups; used to build the "group heads" bitset that powers
  grouped faceting and post-filtering).
- `DistinctValuesCollector.java:31` — for the selected top groups, the
  distinct values of a second field ("count distinct facet values per
  group").
- `LongRangeFactory.java:21` / `DoubleRangeGroupSelector.java` — group
  docs by fixed-width value buckets: `[min+i*width, min+(i+1)*width)`,
  with ALL values below `min` pooled into `(LONG_MIN, min)` and all
  values `>= max` pooled into `[max, LONG_MAX)` (factory contract in
  `LongRangeFactory.getRange`).
- `BlockGroupingCollector.java:46` — groups are contiguous index
  blocks (parent + children written together); top groups ranked by
  the best hit inside the block, with within-group top docs.
- `TermGroupFacetCollector.java:37` — facet counts where each facet
  value counts the number of distinct GROUPS containing it, not the
  number of documents.

Spark re-expression: every one of these is a groupBy or a rank window
over (doc_id, group, score) metadata — narrow rows, partial-aggregated
map-side, k-independent. None of them touches document text, so at
100 TB the shuffled payload is a few dozen bytes per matching doc and
the group-key cardinality bounds reducer state exactly like the
collectors' per-group slot arrays. The range selector is a pure
arithmetic Column (whole-stage codegen'd), so range grouping adds zero
Python and zero extra shuffle over a plain groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "all_groups",
    "all_group_heads",
    "distinct_values_per_group",
    "long_range_group",
    "range_group_topk",
    "block_grouping_topk",
    "group_facet_counts",
]

_LONG_MIN = -(2**63)
_LONG_MAX = 2**63 - 1


def all_groups(matched: DataFrame, group_col: str) -> DataFrame:
    """AllGroupsCollector (`AllGroupsCollector.java:33`): the distinct
    group values of the match set, one row per group, sorted for
    determinism. `getGroupCount` is simply ``count()`` of the result."""
    return (
        matched.select(F.col(group_col).alias("group"))
        .distinct()
        .orderBy("group")
    )


def all_group_heads(
    matched: DataFrame,
    group_col: str,
    score_col: str = "s",
    tie_col: str = "doc_id",
) -> DataFrame:
    """AllGroupHeadsCollector (`AllGroupHeadsCollector.java:41`): the
    head (most competitive: score desc, docID asc — the collector's
    `compare` contract) document of EVERY group in the match set.
    Unlike `collapse_topk` there is no top-k truncation: the result
    has exactly one row per distinct group."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(tie_col).asc()
    )
    return (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select(
            F.col(group_col).alias("group"),
            F.col(tie_col).alias("doc_id"),
            F.round(F.col(score_col), 4).alias("score"),
        )
        .orderBy("group")
    )


def distinct_values_per_group(
    matched: DataFrame,
    group_col: str,
    value_col: str,
    k_groups: int = 10,
) -> DataFrame:
    """DistinctValuesCollector (`DistinctValuesCollector.java:31`): for
    the top ``k_groups`` groups of the first pass (ranked by group
    size desc then group value asc here — a deterministic stand-in for
    the caller-supplied group sort), the sorted distinct values of
    ``value_col`` inside each group.

    One partial-agg'd groupBy over (group, value) pairs, then a
    broadcast semi-join of the tiny selected-group set — the corpus
    never shuffles twice."""
    sizes = (
        matched.groupBy(F.col(group_col).alias("group"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("group").asc())
        .limit(k_groups)
        .select("group")
    )
    pairs = (
        matched.select(
            F.col(group_col).alias("group"), F.col(value_col).alias("value")
        )
        .distinct()
        .join(F.broadcast(sizes), "group")
    )
    return (
        pairs.groupBy("group")
        .agg(F.sort_array(F.collect_set("value")).alias("values"))
        .select(
            "group",
            F.size("values").alias("n_distinct"),
            F.concat_ws("|", "values").alias("values"),
        )
        .orderBy("group")
    )


def long_range_group(
    value: Column, min_v: int, width: int, max_v: int
) -> Column:
    """`LongRangeFactory.getRange` (`LongRangeFactory.java:47`) as a
    pure arithmetic Column: returns a struct (gmin, gmax) — inclusive
    lower, exclusive upper. Values below ``min_v`` pool into
    (LONG_MIN, min_v); values >= ``max_v`` pool into [max_v, LONG_MAX).
    Whole-stage codegen'd; no UDF."""
    v = value.cast("long")
    bucket_min = F.lit(min_v) + ((v - F.lit(min_v)) / F.lit(width)).cast(
        "long"
    ) * F.lit(width)
    gmin = (
        F.when(v < min_v, F.lit(_LONG_MIN))
        .when(v >= max_v, F.lit(max_v))
        .otherwise(bucket_min)
    )
    gmax = (
        F.when(v < min_v, F.lit(min_v))
        .when(v >= max_v, F.lit(_LONG_MAX))
        .otherwise(bucket_min + F.lit(width))
    )
    return F.struct(gmin.cast("long").alias("gmin"), gmax.cast("long").alias("gmax"))


def range_group_topk(
    df: DataFrame,
    value_col: str,
    min_v: int,
    width: int,
    max_v: int,
    k_within: int = 2,
    score_col: str | None = None,
    tie_col: str = "doc_id",
) -> DataFrame:
    """GroupingSearch with a LongRangeGroupSelector
    (`LongRangeGroupSelector.java`, factory semantics
    `LongRangeFactory.java:47`): bucket every row into its fixed-width
    range group, rank groups by (gmin asc), and keep the top
    ``k_within`` rows per group (score desc if given else value asc,
    tie on ``tie_col``). Returns (gmin, gmax, doc_id, value) rows."""
    g = long_range_group(F.col(value_col), min_v, width, max_v)
    keyed = df.withColumn("_g", g)
    order = (
        [F.col(score_col).desc(), F.col(tie_col).asc()]
        if score_col
        else [F.col(value_col).asc(), F.col(tie_col).asc()]
    )
    w = Window.partitionBy("_g.gmin", "_g.gmax").orderBy(*order)
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_within)
        .select(
            F.col("_g.gmin").alias("gmin"),
            F.col("_g.gmax").alias("gmax"),
            F.col(tie_col).alias("doc_id"),
            F.col(value_col).alias("value"),
        )
        .orderBy("gmin", "gmax", "doc_id")
    )


def block_grouping_topk(
    children: DataFrame,
    parent_key: str,
    score_col: str,
    k_groups: int = 5,
    k_within: int = 2,
    tie_col: str = "doc_id",
) -> DataFrame:
    """BlockGroupingCollector (`BlockGroupingCollector.java:46`): hits
    grouped by their contiguous parent block, top ``k_groups`` groups
    ranked by the best hit in the block (groupSort = relevance:
    max child score desc, parent asc), ``k_within`` docs within each
    group (score desc, docID asc).

    The index-layout trick the reference relies on (children written
    physically before their parent so a bitset walk recovers the
    block) maps here to the parent-key column the block-join gates
    already carry — grouping is a rank window over narrow metadata
    partitioned by that key, then a broadcast semi-join of the tiny
    winning-group set."""
    w = Window.partitionBy(parent_key).orderBy(
        F.col(score_col).desc(), F.col(tie_col).asc()
    )
    ranked = children.withColumn("_rn", F.row_number().over(w))
    tops = (
        ranked.filter(F.col("_rn") == 1)
        .select(
            F.col(parent_key).alias("_pk"),
            F.col(score_col).alias("_gs"),
        )
        .orderBy(F.col("_gs").desc(), F.col("_pk").asc())
        .limit(k_groups)
    )
    return (
        ranked.filter(F.col("_rn") <= k_within)
        .join(F.broadcast(tops), ranked[parent_key] == F.col("_pk"))
        .select(
            F.col(parent_key).alias("group"),
            F.round("_gs", 4).alias("group_score"),
            F.col(tie_col).alias("doc_id"),
            F.round(F.col(score_col), 4).alias("score"),
        )
        .orderBy(
            F.col("group_score").desc(),
            F.col("group").asc(),
            F.col("score").desc(),
            F.col("doc_id").asc(),
        )
    )


def group_facet_counts(
    matched: DataFrame, group_col: str, facet_col: str
) -> DataFrame:
    """TermGroupFacetCollector (`TermGroupFacetCollector.java:37`): per
    facet value, the number of DISTINCT groups whose docs carry it —
    each (group, facet) pair counts once no matter how many documents
    repeat it. One distinct + one partial-agg'd groupBy."""
    return (
        matched.select(
            F.col(group_col).alias("group"), F.col(facet_col).alias("facet")
        )
        .distinct()
        .groupBy("facet")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .orderBy(F.col("n_groups").desc(), F.col("facet").asc())
    )
