"""FacetSet matching/counting semantics vs the reference
(facet/facetset): per-SET matcher counts, per-DOC total, DimRange
bound folding, and the one-projection plan shape."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.facetset import (
    dim_range,
    exact_matcher,
    matching_facet_sets_counts,
    range_matcher,
)


def _docs(spark):
    # doc 1: two sets both (1, 10) — an exact matcher must count 2
    # doc 2: one set (1, 10), one (2, 20)
    # doc 3: no matching sets
    return spark.createDataFrame(
        [
            (1, [[1, 10], [1, 10]]),
            (2, [[1, 10], [2, 20]]),
            (3, [[9, 99]]),
        ],
        "doc int, sets array<array<bigint>>",
    )


def _counts(df):
    return {r.label: r.cnt for r in df.collect()}


def test_exact_counts_per_set(spark):
    # MatchingFacetSetsCounts.java:127: counts[j]++ per matching SET
    out = _counts(
        matching_facet_sets_counts(
            _docs(spark), "sets", [exact_matcher("a", [1, 10])]
        )
    )
    assert out["a"] == 3  # doc1 twice + doc2 once
    assert out["__total__"] == 2  # docs 1 and 2


def test_range_and_total(spark):
    out = _counts(
        matching_facet_sets_counts(
            _docs(spark),
            "sets",
            [
                range_matcher("r", [dim_range(1, 2), dim_range(10, 20)]),
                exact_matcher("e", [9, 99]),
            ],
        )
    )
    assert out["r"] == 4  # all four sets of docs 1-2
    assert out["e"] == 1
    assert out["__total__"] == 3  # every doc matched something


def test_no_matches(spark):
    out = _counts(
        matching_facet_sets_counts(
            _docs(spark), "sets", [exact_matcher("x", [7, 7])]
        )
    )
    assert out["x"] == 0
    assert out["__total__"] == 0


def test_dimension_count_must_match(spark):
    # a 1-dim matcher never matches 2-dim sets (the reference asserts;
    # we treat it as non-match)
    out = _counts(
        matching_facet_sets_counts(
            _docs(spark), "sets", [exact_matcher("one", [1])]
        )
    )
    assert out["one"] == 0


def test_dim_range_bounds():
    # DimRange.fromLongs (DimRange.java:33)
    assert dim_range(1, 5) == (1, 5)
    assert dim_range(1, 5, min_inclusive=False) == (2, 5)
    assert dim_range(1, 5, max_inclusive=False) == (1, 4)
    with pytest.raises(ValueError):
        dim_range(5, 1)
    with pytest.raises(ValueError):
        dim_range((1 << 63) - 1, (1 << 63) - 1, min_inclusive=False)


def test_requires_matchers(spark):
    with pytest.raises(ValueError):
        matching_facet_sets_counts(_docs(spark), "sets", [])


def test_single_scan_plan(spark):
    # the whole counting pass is HOF projections + one aggregate — no
    # explode (Generate) node and no join
    df = matching_facet_sets_counts(
        _docs(spark),
        "sets",
        [exact_matcher("a", [1, 10]), range_matcher("r", [(0, 9), (0, 99)])],
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan
    assert "Join" not in plan
