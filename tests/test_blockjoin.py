"""Block join score modes (`join/ScoreMode.java:20`,
`ToParentBlockJoinQuery.java:63`, `ToChildBlockJoinQuery.java:42`) and
association facets (`facet/taxonomy/FloatAssociationFacetField.java:30`)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lucene_spark.search.blockjoin import (
    SCORE_MODES,
    to_child_block_join,
    to_parent_block_join,
)
from lucene_spark.search.facets import association_children

PARENTS = [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
CHILDREN = [  # (parent, value)
    (1, 10.0), (1, 30.0), (2, 5.0), (2, 5.0), (2, 20.0), (4, 7.0),
]


@pytest.fixture(scope="module")
def tables(spark):
    p = spark.createDataFrame(PARENTS, "pid long, tag string")
    c = spark.createDataFrame(CHILDREN, "cpid long, v double")
    return p, c


@pytest.mark.parametrize("mode", SCORE_MODES)
def test_parent_score_modes(tables, mode):
    p, c = tables
    got = {
        r["pid"]: (r["score"], r["n_children"])
        for r in to_parent_block_join(p, c, "pid", "cpid", F.col("v"), mode).collect()
    }
    per = {}
    for k, v in CHILDREN:
        per.setdefault(k, []).append(v)
    agg = {
        "none": lambda vs: 0.0,
        "avg": lambda vs: sum(vs) / len(vs),
        "max": max,
        "total": sum,
        "min": min,
    }[mode]
    want = {k: (agg(vs), len(vs)) for k, vs in per.items()}
    assert got == want  # parent 3 (childless) absent in both


def test_parent_bad_mode(tables):
    p, c = tables
    with pytest.raises(ValueError):
        to_parent_block_join(p, c, "pid", "cpid", F.col("v"), "median")


def test_child_join_inherits_parent_score(tables):
    p, c = tables
    sel = p.filter(F.col("pid") <= 2)
    got = {
        (r["cpid"], r["v"]): r["score"]
        for r in to_child_block_join(
            sel, c, "pid", "cpid", parent_score=F.col("pid") * 1.5
        ).collect()
    }
    want = {
        (k, v): k * 1.5 for k, v in CHILDREN if k <= 2
    }
    assert got == want


def test_association_children(spark):
    rows = [
        ("en/web", 10), ("en/web", 5), ("en/book", 100), ("de/web", 7),
    ]
    df = spark.createDataFrame(rows, "cat string, val long")
    got = [
        (r["child"], r["assoc"], r["cnt"])
        for r in association_children(df, "cat", "val", agg="sum").collect()
    ]
    assert got == [("en", 115.0, 3), ("de", 7.0, 1)]
    under_en = [
        (r["child"], r["assoc"])
        for r in association_children(df, "cat", "val", ("en",), agg="max").collect()
    ]
    assert under_en == [("book", 100.0), ("web", 10.0)]
    with pytest.raises(ValueError):
        association_children(df, "cat", "val", agg="median")


def test_parent_sort_by_child_selector_and_missing(spark):
    # ToParentBlockJoinSortField.java:146 — reverse flag selects
    # BlockJoinSelector.Type.MAX vs MIN; parents with no (filtered)
    # children sort last
    from lucene_spark.search.blockjoin import parent_sort_by_child
    from pyspark.sql import functions as F

    parents = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    children = spark.createDataFrame(
        [(1, 5.0), (1, 9.0), (2, 7.0)], "ck bigint, v double"
    )
    rows = parent_sort_by_child(
        parents, children, "pk", "ck", F.col("v"), selector="min",
        ascending=True, tie_col="pk",
    ).collect()
    assert [(r.pk, r.sort_value) for r in rows] == [
        (1, 5.0), (2, 7.0), (3, None),
    ]
    rows = parent_sort_by_child(
        parents, children, "pk", "ck", F.col("v"), selector="max",
        ascending=False, tie_col="pk",
    ).collect()
    assert [(r.pk, r.sort_value) for r in rows] == [
        (1, 9.0), (2, 7.0), (3, None),
    ]
