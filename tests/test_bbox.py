"""BBoxStrategy analog (spatial-extras/bbox/BBoxStrategy.java +
BBoxOverlapRatioValueSource.java:70): relations, the overlap-ratio
score with minSideLength'd areas and line/point fallbacks, XDL query
legs, and the dual Spark/DuckDB emission."""

import duckdb
import pytest
from pyspark.sql import functions as F

from lucene_spark.search.bbox import (
    bbox_overlap_score_sql,
    bbox_overlap_topk,
    bbox_query,
    bbox_relation_sql,
)


def _boxes(spark, rows):
    return spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "doc_id long, min_lat double, max_lat double, min_lon double, max_lon double",
    )


BOXES = [
    (0.0, 10.0, 0.0, 10.0),      # 0: inside the query box below
    (-5.0, 5.0, -5.0, 5.0),      # 1: partial overlap
    (40.0, 50.0, 40.0, 50.0),    # 2: disjoint
    (-20.0, 30.0, -20.0, 30.0),  # 3: contains the query box
    (2.0, 2.0, 1.0, 9.0),        # 4: horizontal line inside
]
QBOX = (-10.0, 20.0, -10.0, 20.0)


def test_relations(spark):
    df = _boxes(spark, BOXES)
    ids = lambda rel: {r.doc_id for r in bbox_query(df, QBOX, rel).collect()}
    assert ids("intersects") == {0, 1, 3, 4}
    assert ids("disjoint") == {2}
    assert ids("within") == {0, 1, 4}
    assert ids("contains") == {3}
    with pytest.raises(ValueError):
        bbox_relation_sql(QBOX, "overlapping")


def test_overlap_score_hand_computed(spark):
    df = _boxes(spark, BOXES)
    got = {r.doc_id: r.score for r in bbox_overlap_topk(df, QBOX, k=10).collect()}
    q_area = 30.0 * 30.0
    # doc0: inter 10x10=100; target area 100 -> 100/900*0.25 + 1.0*0.75
    assert got[0] == pytest.approx(round(100 / q_area * 0.25 + 1.0 * 0.75, 6))
    # doc1: inter 10x10=100 (clipped at -5..5 vs -10..20); target 100
    assert got[1] == pytest.approx(round(100 / q_area * 0.25 + 1.0 * 0.75, 6))
    # doc3: inter = whole query 900; target 50x50=2500
    assert got[3] == pytest.approx(round(1.0 * 0.25 + 900 / 2500 * 0.75, 6))
    # doc4: line target, area 0 -> targetRatio = width ratio = 8/8 = 1
    assert got[4] == pytest.approx(round(0.0 * 0.25 + 1.0 * 0.75, 6))
    assert 2 not in got  # zero scores dropped


def test_min_side_length_ranks_lines_by_area(spark):
    # with minSideLength the line's area is no longer zero, so the
    # intersection area path is used and smaller boxes score higher
    df = _boxes(spark, BOXES)
    got = {
        r.doc_id: r.score
        for r in bbox_overlap_topk(df, QBOX, k=10, min_side_length=1.0).collect()
    }
    # doc4 line: w=8, h=max(1,0)=1 -> target area 8; inter area 8
    assert got[4] == pytest.approx(round(8 / 900 * 0.25 + 1.0 * 0.75, 6))


def test_xdl_query_two_legs(spark):
    # query crosses the dateline: [170, -170] x [-10, 10]
    df = _boxes(
        spark,
        [
            (0.0, 5.0, 172.0, 178.0),    # west leg only
            (0.0, 5.0, -178.0, -172.0),  # east leg only
            (0.0, 5.0, -50.0, -40.0),    # outside both legs
        ],
    )
    q = (-10.0, 10.0, 170.0, -170.0)
    got = {r.doc_id: r.score for r in bbox_overlap_topk(df, q, k=10).collect()}
    assert set(got) == {0, 1} and got[0] == got[1]  # symmetric legs
    q_area = 20.0 * 20.0  # width (180-170)+(-170+180)=20, height 20
    # doc0: intersection 6 wide x 5 tall = 30; target area 30
    want = round(30 / q_area * 0.25 + 1.0 * 0.75, 6)
    assert got[0] == pytest.approx(want)


def test_dual_emission_matches_duckdb(spark):
    df = _boxes(spark, BOXES)
    sql = bbox_overlap_score_sql(QBOX, 0.25, 0.5)
    got = {
        r.doc_id: round(r.s, 9)
        for r in df.select("doc_id", F.expr(sql).alias("s")).collect()
    }
    con = duckdb.connect()
    con.register("b", df.toPandas())
    want = {
        r[0]: round(r[1], 9)
        for r in con.sql(f"SELECT doc_id, {sql} AS s FROM b").fetchall()
    }
    assert got == want
