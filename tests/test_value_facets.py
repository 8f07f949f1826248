"""Value-source + range-on-range facet semantics vs the reference
(facet/StringValueFacetCounts, LongValueFacetCounts,
rangeonrange/RangeOnRangeFacetCounts): multi-valued distinct-per-doc
counting, header fields, long tie-asc ordering, and relation types."""

from pyspark.sql import functions as F

from lucene_spark.search.facets import (
    long_value_facet_counts,
    range_on_range_counts,
    string_value_facet_counts,
)


def test_string_multivalued_counts_distinct_per_doc(spark):
    # StringValueFacetCounts.java:176 — a doc repeating a value counts
    # it ONCE (SSDV distinct ords); null/empty docs don't reach
    # totalDocCount
    df = spark.createDataFrame(
        [
            (1, ["a", "a", "b"]),
            (2, ["b"]),
            (3, []),
        ],
        "doc_id bigint, vals array<string>",
    )
    rows = string_value_facet_counts(df, "vals", top_n=10).collect()
    assert [(r.label, r.cnt) for r in rows] == [("b", 2), ("a", 1)]
    assert rows[0].total_docs == 2  # doc 3 has no values
    assert rows[0].child_count == 2


def test_string_scalar_tie_breaks_label_asc(spark):
    df = spark.createDataFrame(
        [(1, "y"), (2, "x"), (3, "x"), (4, "y"), (5, "z")],
        "doc_id bigint, v string",
    )
    rows = string_value_facet_counts(df, "v", top_n=2).collect()
    assert [(r.label, r.cnt) for r in rows] == [("x", 2), ("y", 2)]
    assert rows[0].child_count == 3


def test_long_value_tie_breaks_value_asc(spark):
    # LongValueFacetCounts.java:413 — count desc, ties by VALUE asc
    # (so 2 beats 10 on a tie even though '10' < '2' as strings is
    # false ordering — the top-N selection is numeric)
    df = spark.createDataFrame(
        [(10,), (10,), (2,), (2,), (7,)], "v bigint"
    )
    rows = long_value_facet_counts(df, "v", top_n=2).collect()
    got = {r.label: r.cnt for r in rows}
    assert got == {"2": 2, "10": 2}
    assert rows[0].total_docs == 5
    assert rows[0].child_count == 3


def test_range_on_range_relations(spark):
    # stored ranges: [0,5], [4,10], [20,30]
    df = spark.createDataFrame(
        [(0.0, 5.0), (4.0, 10.0), (20.0, 30.0)], "rmin double, rmax double"
    )
    inter = range_on_range_counts(
        df, "rmin", "rmax", [("q", 3.0, 6.0)], "intersects"
    ).collect()[0]
    assert (inter.cnt, inter.total_docs) == (2, 3)
    within = range_on_range_counts(
        df, "rmin", "rmax", [("q", 0.0, 12.0)], "within"
    ).collect()[0]
    assert within.cnt == 2
    contains = range_on_range_counts(
        df, "rmin", "rmax", [("q", 4.0, 5.0)], "contains"
    ).collect()[0]
    assert contains.cnt == 2
    # crosses = intersects && !within (RangeFieldQuery.java:268)
    crosses = range_on_range_counts(
        df, "rmin", "rmax", [("q", 3.0, 6.0)], "crosses"
    ).collect()[0]
    assert crosses.cnt == 2
