"""LatLonShape box relations vs an independent python geometry oracle
(true segment intersection incl. collinear cases) on deterministic
synthetic shapes."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.search.shape import shape_box_query

BOX = (-2.0, 3.0, -1.0, 4.0)  # (min_lat, max_lat, min_lon, max_lon)


def _verts(i, n=4):
    lats = [((i * 37 + j * 59) % 128) / 8.0 - 8.0 for j in range(n)]
    lons = [((i * 23 + j * 83) % 128) / 8.0 - 8.0 for j in range(n)]
    return lats, lons


@pytest.fixture(scope="module")
def shapes(spark):
    rows = []
    for i in range(500):
        lats, lons = _verts(i)
        rows.append((i, lats, lons))
    return rows, spark.createDataFrame(
        rows, "id long, lats array<double>, lons array<double>"
    )


# --- independent geometry oracle -------------------------------------------


def _inbox(y, x):
    return BOX[0] <= y <= BOX[1] and BOX[2] <= x <= BOX[3]


def _orient(a, b, c):
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _seg_intersect(a, b, c, d):
    o1, o2 = _orient(a, b, c), _orient(a, b, d)
    o3, o4 = _orient(c, d, a), _orient(c, d, b)
    if o1 * o2 <= 0 and o3 * o4 <= 0:
        return (
            max(a[0], b[0]) >= min(c[0], d[0])
            and min(a[0], b[0]) <= max(c[0], d[0])
            and max(a[1], b[1]) >= min(c[1], d[1])
            and min(a[1], b[1]) <= max(c[1], d[1])
        )
    return False


def _box_edges():
    (s, n_, w, e) = BOX
    c = [(w, s), (e, s), (e, n_), (w, n_)]
    return [(c[i], c[(i + 1) % 4]) for i in range(4)]


def _segments(lats, lons, closed):
    pts = [(x, y) for y, x in zip(lats, lons)]  # (x, y)
    rng = range(len(pts)) if closed else range(len(pts) - 1)
    return [(pts[i], pts[(i + 1) % len(pts)]) for i in rng]


def _ring_intersects(lats, lons, closed):
    if any(_inbox(y, x) for y, x in zip(lats, lons)):
        return True
    for a, b in _segments(lats, lons, closed):
        for c, d in _box_edges():
            if _seg_intersect(a, b, c, d):
                return True
    return False


def _point_in_poly(lats, lons, py, px):
    n = len(lats)
    cnt = 0
    for i in range(n):
        ay, ax = lats[i], lons[i]
        by, bx = lats[(i + 1) % n], lons[(i + 1) % n]
        if (ay > py) != (by > py) and px < (py - ay) * (bx - ax) / (by - ay) + ax:
            cnt += 1
    return cnt % 2 == 1


def _brute(rows, relation, polygon):
    out = set()
    for i, lats, lons in rows:
        within = all(_inbox(y, x) for y, x in zip(lats, lons))
        inter = _ring_intersects(lats, lons, closed=polygon)
        if polygon:
            inter = inter or _point_in_poly(lats, lons, BOX[0], BOX[2])
        ok = {
            "within": within,
            "intersects": inter,
            "disjoint": not inter,
        }[relation]
        if ok:
            out.add(i)
    return out


@pytest.mark.parametrize("relation", ["intersects", "within", "disjoint"])
@pytest.mark.parametrize("polygon", [False, True])
def test_shape_box_relations(shapes, relation, polygon):
    rows, df = shapes
    got = {
        r["id"]
        for r in shape_box_query(df, BOX, relation, polygon=polygon).collect()
    }
    assert got == _brute(rows, relation, polygon)


def test_within_implies_intersects(shapes):
    rows, df = shapes
    w = {r["id"] for r in shape_box_query(df, BOX, "within").collect()}
    i = {r["id"] for r in shape_box_query(df, BOX, "intersects").collect()}
    assert w <= i
    d = {r["id"] for r in shape_box_query(df, BOX, "disjoint").collect()}
    assert not (i & d) and len(i | d) == len(rows)


def test_box_inside_polygon_counts_as_intersects(spark):
    # a big square ring strictly containing BOX: no edge crossing, no
    # vertex in box — only the corner-in-polygon test can catch it
    df = spark.createDataFrame(
        [(0, [-20.0, -20.0, 20.0, 20.0], [-20.0, 20.0, 20.0, -20.0])],
        "id long, lats array<double>, lons array<double>",
    )
    assert shape_box_query(df, BOX, "intersects", polygon=True).count() == 1
    # the open POLYLINE with the same vertices also misses the box
    assert shape_box_query(df, BOX, "intersects", polygon=False).count() == 0


def test_bad_relation(shapes):
    _, df = shapes
    with pytest.raises(ValueError):
        shape_box_query(df, BOX, "touches")
