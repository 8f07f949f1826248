"""Range fields (IntRange/LongRange/DoubleRange + RangeFieldQuery
relations) vs a python brute-force oracle, plus relation algebra
invariants."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.search.rangefield import RELATIONS, range_query


@pytest.fixture(scope="module")
def ranges(spark):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(300):
        a = int(rng.randint(0, 50))
        b = a + int(rng.randint(0, 20))
        rows.append((i, a, b))
    return rows, spark.createDataFrame(rows, "id long, rmin int, rmax int")


def _brute(rows, lo, hi, relation):
    out = set()
    for i, a, b in rows:
        inter = a <= hi and b >= lo
        within = lo <= a and b <= hi
        contains = a <= lo and hi <= b
        ok = {
            "intersects": inter,
            "within": within,
            "contains": contains,
            "crosses": inter and not within,
        }[relation]
        if ok:
            out.add(i)
    return out


@pytest.mark.parametrize("relation", RELATIONS)
@pytest.mark.parametrize("lo,hi", [(10, 30), (0, 5), (45, 70), (20, 20)])
def test_range_relations(ranges, relation, lo, hi):
    rows, df = ranges
    got = {
        r["id"] for r in range_query(df, "rmin", "rmax", lo, hi, relation).collect()
    }
    assert got == _brute(rows, lo, hi, relation)


def test_relation_partition(ranges):
    """within ∪ crosses partitions intersects (RangeFieldQuery.java:268:
    CROSSES = INTERSECTS && !WITHIN, so the two are disjoint and
    exhaust intersection); CONTAINS members land in crosses unless the
    stored range equals the query (the only contains∩within case)."""
    rows, df = ranges
    lo, hi = 12, 28
    inter = _brute(rows, lo, hi, "intersects")
    w = _brute(rows, lo, hi, "within")
    c = _brute(rows, lo, hi, "contains")
    x = _brute(rows, lo, hi, "crosses")
    assert w | x == inter
    assert not (w & x)
    assert c <= w | x
    for i in c - x:  # contains but not crosses → exact-equal range
        a, b = rows[i][1], rows[i][2]
        assert (a, b) == (lo, hi)


def test_bad_relation(ranges):
    _, df = ranges
    with pytest.raises(ValueError):
        range_query(df, "rmin", "rmax", 0, 1, "overlapz")


# --- multi-dimension (IntRange up to 4 dims) --------------------------------


@pytest.fixture(scope="module")
def ranges2d(spark):
    rng = np.random.RandomState(21)
    rows = []
    for i in range(300):
        a = int(rng.randint(0, 40))
        c = int(rng.randint(0, 40))
        rows.append((i, a, a + int(rng.randint(0, 15)), c, c + int(rng.randint(0, 15))))
    return rows, spark.createDataFrame(
        rows, "id long, amin int, amax int, bmin int, bmax int"
    )


def _brute2d(rows, qa, qb, relation):
    out = set()
    for i, a1, a2, b1, b2 in rows:
        per_dim = []
        for (lo, hi), (x1, x2) in zip((qa, qb), ((a1, a2), (b1, b2))):
            per_dim.append(
                {
                    "intersects": x1 <= hi and x2 >= lo,
                    "within": lo <= x1 and x2 <= hi,
                    "contains": x1 <= lo and hi <= x2,
                }
            )
        inter = all(d["intersects"] for d in per_dim)
        within = all(d["within"] for d in per_dim)
        contains = all(d["contains"] for d in per_dim)
        ok = {
            "intersects": inter,
            "within": within,
            "contains": contains,
            "crosses": inter and not within,
        }[relation]
        if ok:
            out.add(i)
    return out


@pytest.mark.parametrize("relation", RELATIONS)
def test_multi_dim_relations(ranges2d, relation):
    from lucene_spark.search.rangefield import range_query_multi

    rows, df = ranges2d
    dims = [("amin", "amax", 10, 25), ("bmin", "bmax", 5, 30)]
    got = {r["id"] for r in range_query_multi(df, dims, relation).collect()}
    assert got == _brute2d(rows, (10, 25), (5, 30), relation)


def test_dv_multi_range_match(spark):
    from lucene_spark.search.rangefield import dv_multi_range_match

    rows = [(0, [1, 50]), (1, [7, 99]), (2, [99, 100]), (3, [82, 99]), (4, [])]
    df = spark.createDataFrame(rows, "doc_id long, vals array<long>")
    got = sorted(
        r["doc_id"]
        for r in dv_multi_range_match(df, "vals", [(5, 10), (80, 82)]).collect()
    )
    assert got == [1, 3]  # 7 in [5,10]; 82 in [80,82]; empty list never
    assert dv_multi_range_match(df, "vals", []).count() == 0


def test_point_nearest(spark):
    from lucene_spark.search.rangefield import point_nearest

    rows = [(0, 0.0, 0.0), (1, 1.0, 1.0), (2, 3.0, 4.0), (3, -1.0, 0.0)]
    df = spark.createDataFrame(rows, "doc_id long, x double, y double")
    got = [(r["doc_id"], r["dist_sq"]) for r in
           point_nearest(df, ["x", "y"], [0.0, 0.0], k=3, id_col="doc_id").collect()]
    # ties (0,0) dist 0; (1,1)->2; (-1,0)->1
    assert got == [(0, 0.0), (3, 1.0), (1, 2.0)]
    # 1-D convenience form
    one = point_nearest(df, "x", 2.9, k=1).collect()[0]
    assert one["doc_id"] == 2
