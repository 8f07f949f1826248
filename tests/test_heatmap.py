"""HeatmapFacetCounter analog (spatial-extras/prefix/HeatmapFacetCounter.java:40).

Covers the reference's contracts: grid aligned to the level's cell
boundaries, region expanded outward to cover overlapping edge cells,
world +edge folding into the last cell, and the count-per-cell math
(here: hand-computed goldens + a DuckDB cross-check of the dual
emission).
"""

import duckdb
import pytest

from lucene_spark.search.heatmap import (
    MAX_LEVEL,
    cell_size,
    heatmap_counts,
    heatmap_counts_sql,
    snap_region,
)


def test_cell_size_quad_tree_halving():
    assert cell_size(0) == (360.0, 180.0)
    assert cell_size(1) == (180.0, 90.0)
    assert cell_size(4) == (22.5, 11.25)
    with pytest.raises(ValueError):
        cell_size(MAX_LEVEL + 1)
    with pytest.raises(ValueError):
        cell_size(-1)


def test_snap_region_expands_outward():
    # level 2: 90x45-degree cells; a region strictly inside one cell
    # snaps to that full cell
    x0, x1, y0, y1, slat0, slat1, slon0, slon1 = snap_region(
        1.0, 2.0, 1.0, 2.0, level=2
    )
    assert (x0, x1) == (2, 2) and (y0, y1) == (2, 2)
    assert (slon0, slon1) == (0.0, 90.0)
    assert (slat0, slat1) == (0.0, 45.0)
    # a region straddling a boundary includes both cells
    x0, x1, y0, y1, *_ = snap_region(-1.0, 1.0, -1.0, 1.0, level=2)
    assert (x0, x1) == (1, 2) and (y0, y1) == (1, 2)


def test_snap_region_world_edge_folds():
    x0, x1, y0, y1, slat0, slat1, slon0, slon1 = snap_region(
        89.0, 90.0, 179.0, 180.0, level=3
    )
    # lon=180 / lat=90 land in the last cell (index 7), not cell 8
    assert x1 == 7 and y1 == 7
    assert slon1 == 180.0 and slat1 == 90.0


def _pts(spark):
    rows = [
        # (lat, lon) — level-2 cells are 90 wide x 45 tall
        (10.0, 10.0),   # cell (2, 2)
        (20.0, 20.0),   # cell (2, 2)
        (10.0, 100.0),  # cell (3, 2)
        (50.0, 10.0),   # cell (2, 3)
        (90.0, 180.0),  # world +edge -> cell (3, 3)
        (-50.0, -100.0),  # cell (0, 0)... outside the query region below
    ]
    return spark.createDataFrame(rows, "lat double, lon double")


def test_heatmap_counts_golden(spark):
    hm = heatmap_counts(_pts(spark), 0.0, 90.0, 0.0, 180.0, level=2)
    got = {(r.grid_x, r.grid_y): r.cnt for r in hm.collect()}
    assert got == {(2, 2): 2, (3, 2): 1, (2, 3): 1, (3, 3): 1}


def test_heatmap_counts_sparse_zero_cells_absent(spark):
    hm = heatmap_counts(_pts(spark), 0.0, 90.0, 0.0, 180.0, level=2)
    # 2x2 cells in the region but only 4 non-empty -> 4 rows, not 16
    assert hm.count() == 4


def test_heatmap_edge_point_included_only_via_fold(spark):
    # query only the last column/row: the (90, 180) point must appear
    hm = heatmap_counts(_pts(spark), 46.0, 90.0, 91.0, 180.0, level=2)
    got = {(r.grid_x, r.grid_y): r.cnt for r in hm.collect()}
    assert got == {(3, 3): 1}


def test_dual_emission_matches_duckdb(spark):
    pdf = _pts(spark).toPandas()
    con = duckdb.connect()
    con.register("pts", pdf)
    args = dict(min_lat=-60.0, max_lat=90.0, min_lon=-120.0, max_lon=180.0, level=3)
    want = {
        (r[0], r[1]): r[2]
        for r in con.sql(
            heatmap_counts_sql("SELECT * FROM pts", **args)
        ).fetchall()
    }
    got = {
        (r.grid_x, r.grid_y): r.cnt
        for r in heatmap_counts(_pts(spark), **args).collect()
    }
    assert got == want and len(got) >= 4


def test_region_filter_prunes(spark):
    # the out-of-region point must not be scanned into the aggregate
    hm = heatmap_counts(_pts(spark), 0.0, 90.0, 0.0, 180.0, level=2)
    assert hm.groupBy().sum("cnt").collect()[0][0] == 5
    plan = hm._sc._jvm.PythonSQLUtils.explainString(
        hm._jdf.queryExecution(), "formatted"
    )
    # partial aggregation before the exchange (map-side combine)
    assert "HashAggregate" in plan and "Exchange" in plan
