"""Grouping-module completion semantics vs the reference
(grouping/AllGroupsCollector, AllGroupHeadsCollector,
DistinctValuesCollector, LongRangeFactory, BlockGroupingCollector,
TermGroupFacetCollector): hand-traced fixtures, the range-factory
edge-bucket quirks, and the exactly-one-head-per-group invariant."""

from pyspark.sql import functions as F

from lucene_spark.search.grouping import (
    _LONG_MAX,
    _LONG_MIN,
    all_group_heads,
    all_groups,
    block_grouping_topk,
    distinct_values_per_group,
    group_facet_counts,
    long_range_group,
    range_group_topk,
)


def _m(spark):
    # (doc_id, group, s, facet)
    return spark.createDataFrame(
        [
            (1, "a", 5.0, "x"),
            (2, "a", 5.0, "y"),
            (3, "b", 9.0, "x"),
            (4, "b", 1.0, "x"),
            (5, "c", 7.0, "z"),
        ],
        "doc_id bigint, grp string, s double, facet string",
    )


def test_all_groups(spark):
    # AllGroupsCollector.java:33 — distinct groups, sorted
    out = [r.group for r in all_groups(_m(spark), "grp").collect()]
    assert out == ["a", "b", "c"]


def test_all_group_heads_one_per_group_and_tiebreak(spark):
    # AllGroupHeadsCollector.java:41 — every group keeps exactly one
    # head; the a-group tie (5.0 vs 5.0) breaks on docID asc
    rows = all_group_heads(_m(spark), "grp", "s").collect()
    assert [(r.group, r.doc_id, r.score) for r in rows] == [
        ("a", 1, 5.0),
        ("b", 3, 9.0),
        ("c", 5, 7.0),
    ]


def test_distinct_values_per_group(spark):
    # DistinctValuesCollector.java:31 — top-2 groups by size (a=2,b=2
    # tie -> group value asc), sorted distinct facet values inside each
    rows = distinct_values_per_group(_m(spark), "grp", "facet", 2).collect()
    assert [(r.group, r.n_distinct, r.values) for r in rows] == [
        ("a", 2, "x|y"),
        ("b", 1, "x"),
    ]


def test_long_range_factory_edges(spark):
    # LongRangeFactory.java:47 — below-min pools to (LONG_MIN, min);
    # >= max pools to [max, LONG_MAX); the last regular bucket may
    # extend past max (value 399 -> [350, 450) with min=50,w=100,max=400)
    df = spark.createDataFrame(
        [(v,) for v in [-3, 49, 50, 149, 150, 399, 400, 10_000]], "v bigint"
    ).select("v", long_range_group(F.col("v"), 50, 100, 400).alias("g"))
    got = {r.v: (r.g.gmin, r.g.gmax) for r in df.collect()}
    assert got[-3] == (_LONG_MIN, 50)
    assert got[49] == (_LONG_MIN, 50)
    assert got[50] == (50, 150)
    assert got[149] == (50, 150)
    assert got[150] == (150, 250)
    assert got[399] == (350, 450)
    assert got[400] == (400, _LONG_MAX)
    assert got[10_000] == (400, _LONG_MAX)


def test_range_group_topk_within(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([10, 20, 30, 60, 70, 80])],
        "doc_id bigint, v bigint",
    )
    rows = range_group_topk(df, "v", 50, 100, 400, k_within=2).collect()
    # below-min bucket keeps v=10,20; [50,150) keeps 60,70
    assert [(r.gmin, r.doc_id, r.value) for r in rows] == [
        (_LONG_MIN, 0, 10),
        (_LONG_MIN, 1, 20),
        (50, 3, 60),
        (50, 4, 70),
    ]


def test_block_grouping_topk(spark):
    # BlockGroupingCollector.java:46 — groups ranked by best hit,
    # k_within docs per group, global ordering deterministic
    c = spark.createDataFrame(
        [
            (1, 100, 2.0),
            (2, 100, 8.0),
            (3, 100, 5.0),
            (4, 200, 9.0),
            (5, 300, 1.0),
        ],
        "doc_id bigint, pk bigint, s double",
    )
    rows = block_grouping_topk(c, "pk", "s", k_groups=2, k_within=2).collect()
    assert [(r.group, r.group_score, r.doc_id, r.score) for r in rows] == [
        (200, 9.0, 4, 9.0),
        (100, 8.0, 2, 8.0),
        (100, 8.0, 3, 5.0),
    ]


def test_group_facet_counts(spark):
    # TermGroupFacetCollector.java:37 — (group, facet) pairs count
    # once: facet x appears in groups a and b -> 2, not 3 docs
    rows = group_facet_counts(_m(spark), "grp", "facet").collect()
    assert [(r.facet, r.n_groups) for r in rows] == [
        ("x", 2),
        ("y", 1),
        ("z", 1),
    ]
