"""DateRangePrefixTree analog: relation predicates and calendar-cell
faceting (spatial-extras NumberRangePrefixTreeStrategy)."""

import datetime

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.daterange import (
    date_range_facet_counts,
    date_range_relation,
)


def _ranges(spark):
    d = datetime.datetime
    return spark.createDataFrame(
        [
            (d(2024, 1, 1, 6), d(2024, 1, 1, 18)),   # inside day 1
            (d(2024, 1, 1, 22), d(2024, 1, 3, 2)),   # spans days 1-3
            (d(2024, 1, 10, 0), d(2024, 1, 20, 0)),  # long range
        ],
        "s timestamp, e timestamp",
    )


def test_day_facets(spark):
    out = {
        r.bucket.day: r.cnt
        for r in date_range_facet_counts(_ranges(spark), "s", "e", "day")
        .collect()
    }
    # day 1 touched by ranges 1+2; days 2,3 by range 2; 10..20 by range 3
    assert out[1] == 2
    assert out[2] == 1
    assert out[3] == 1
    assert out[10] == 1
    assert out[20] == 1
    assert 4 not in out  # sparse: untouched cells absent
    assert len(out) == 3 + 11


def test_month_facets(spark):
    out = date_range_facet_counts(_ranges(spark), "s", "e", "month").collect()
    assert len(out) == 1 and out[0].cnt == 3


def test_bad_level(spark):
    with pytest.raises(ValueError):
        date_range_facet_counts(_ranges(spark), "s", "e", "decade")


@pytest.mark.parametrize(
    "rel,expected",
    [
        ("intersects", 2),  # ranges 2 (ends Jan 3) and 3 overlap [2,12]
        ("within", 0),
        ("contains", 0),
        ("disjoint", 1),
    ],
)
def test_relations(spark, rel, expected):
    d = datetime.datetime
    qs, qe = d(2024, 1, 2), d(2024, 1, 12)
    n = (
        _ranges(spark)
        .filter(date_range_relation(F.col("s"), F.col("e"), qs, qe, rel))
        .count()
    )
    assert n == expected


def test_relation_within_contains(spark):
    d = datetime.datetime
    # query interval containing range 1 entirely
    qs, qe = d(2024, 1, 1), d(2024, 1, 2)
    df = _ranges(spark)
    within = df.filter(
        date_range_relation(F.col("s"), F.col("e"), qs, qe, "within")
    ).count()
    assert within == 1
    # a query inside range 3
    qs2, qe2 = d(2024, 1, 12), d(2024, 1, 13)
    contains = df.filter(
        date_range_relation(F.col("s"), F.col("e"), qs2, qe2, "contains")
    ).count()
    assert contains == 1
    with pytest.raises(ValueError):
        date_range_relation(F.col("s"), F.col("e"), qs, qe, "crosses")
