"""Prefix-tree shape grid (RecursivePrefixTreeStrategy.java:45 analog):
adaptive-level covers, multi-level probe sets, and the identity
grid-prefiltered == exact-scan (the no-false-negative contract)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.shape import shape_box_query
from lucene_spark.search.shapegrid import (
    cover_cells,
    shape_grid_box_query,
    shape_grid_cells,
)


def _shapes(spark, n=300):
    # the deterministic pseudo-random 4-vertex shapes the shape gates use
    return (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .withColumn(
            "lats",
            F.expr(
                "transform(sequence(0, 3), j -> "
                "((doc_id * 37 + j * 59) % 40) / 8.0 - 2.5)"
            ),
        )
        .withColumn(
            "lons",
            F.expr(
                "transform(sequence(0, 3), j -> "
                "((doc_id * 23 + j * 83) % 40) / 8.0 - 2.5)"
            ),
        )
    )


def test_adaptive_level_bounds_cells(spark):
    cells = shape_grid_cells(_shapes(spark), max_level=8, max_cells=16)
    per_doc = cells.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert per_doc <= 16
    # shapes spanning a few degrees at level 8 (1.4 x 0.7 deg cells)
    # should mostly index at a fine level, not fall back to level 0
    lvls = {
        int(r.cell.split("/")[0]) for r in cells.select("cell").distinct().collect()
    }
    assert max(lvls) >= 6


def test_tiny_shape_gets_finest_level(spark):
    df = spark.createDataFrame(
        [(0, [10.0, 10.01], [20.0, 20.01])],
        "doc_id long, lats array<double>, lons array<double>",
    )
    cells = shape_grid_cells(df, max_level=8, max_cells=16).collect()
    assert all(c.cell.startswith("8/") for c in cells)
    assert 1 <= len(cells) <= 4


def test_world_spanning_shape_coarsens(spark):
    df = spark.createDataFrame(
        [(0, [-80.0, 80.0], [-170.0, 170.0])],
        "doc_id long, lats array<double>, lons array<double>",
    )
    cells = shape_grid_cells(df, max_level=8, max_cells=16).collect()
    lvl = int(cells[0].cell.split("/")[0])
    assert lvl <= 2 and len(cells) <= 16


def test_cover_cells_spans_all_levels(spark):
    probes = cover_cells(0.0, 1.0, 0.0, 1.0, max_level=3)
    lvls = {int(p.split("/")[0]) for p in probes}
    assert lvls == {0, 1, 2, 3}
    assert "0/0/0" in probes  # the world cell is always probed


@pytest.mark.parametrize("relation", ["intersects", "within", "disjoint"])
@pytest.mark.parametrize("polygon", [False, True])
def test_grid_query_equals_exact_scan(spark, relation, polygon):
    shapes = _shapes(spark)
    cells = shape_grid_cells(shapes, max_level=8, max_cells=16)
    box = (-2.0, 1.0, -1.0, 2.0)
    got = {
        r.doc_id
        for r in shape_grid_box_query(
            shapes, cells, box, relation, polygon=polygon, max_level=8
        ).collect()
    }
    want = {
        r.doc_id
        for r in shape_box_query(shapes, box, relation, polygon=polygon).collect()
    }
    assert got == want and (relation == "within" or len(want) > 0)


def test_grid_actually_prunes(spark):
    # a query box far from most shapes: the candidate set must be a
    # small fraction of the corpus (the point of the index)
    shapes = _shapes(spark)
    cells = shape_grid_cells(shapes, max_level=8, max_cells=16)
    probes = cover_cells(60.0, 61.0, 100.0, 101.0, max_level=8)
    n_cand = (
        cells.filter(F.col("cell").isin(probes)).select("doc_id").distinct().count()
    )
    assert n_cand == 0  # every shape lives in [-2.5, 2.5]^2
