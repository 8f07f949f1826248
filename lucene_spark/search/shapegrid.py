"""Prefix-tree shape indexing (RecursivePrefixTreeStrategy analog).

`lucene/spatial-extras/src/java/org/apache/lucene/spatial/prefix/
RecursivePrefixTreeStrategy.java:45` indexes each shape as the set of
grid cells (prefix-tree terms) covering it, at a per-shape detail
level, and answers relation queries by seeking the query shape's cell
terms — turning expensive geometry into term lookups, with an exact
refine where needed.

The Spark re-expression keeps the quad-tree cell algebra of
:mod:`lucene_spark.search.heatmap` and makes the cell set a TABLE:

- :func:`shape_grid_cells` — per shape, the covering cells of its
  bounding box at a per-shape ADAPTIVE level: the finest level (up to
  ``max_level``) whose cover stays within ``max_cells`` — the same
  bounded-detail contract as the reference's ``distErrPct``-derived
  level (PrefixTreeStrategy.java `getLevelForDistance`). Everything is
  one codegen'd projection (array_min/max for the bbox, a CASE ladder
  over the static level list, sequence x sequence HOFs for the cell
  ids) + one explode — no UDF, no driver geometry. At 100 TB the cell
  table is written bucketed/partitioned by ``cell``, so a query's
  probe set prunes partitions exactly like the reference's term seeks
  prune the terms dictionary.
- :func:`cover_cells` — the query box's probe set: its cover at EVERY
  level ≤ ``max_level`` (shapes chose their own level, so the probe
  must include each level's cover — the prefix-tree query's
  multi-level seek). Driver-side, tiny.
- :func:`shape_grid_box_query` — probe-set semi-join to candidates,
  then the EXACT :func:`lucene_spark.search.shape` relation refines.
  Correctness does not depend on the grid: two overlapping boxes
  always share a cell at the shape's own level, so the candidate set
  can never drop a true INTERSECTS/WITHIN match (DISJOINT queries are
  complements and bypass the grid, exactly like the reference's
  DISJOINT handling rewrites around the tree).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, functions as F

from .heatmap import MAX_LEVEL, snap_region
from .shape import line_box_relation, polygon_box_relation

__all__ = ["shape_grid_cells", "cover_cells", "shape_grid_box_query"]


def _cover_bounds_col(
    ymin: str, ymax: str, xmin: str, xmax: str, level: int
) -> str:
    """SQL struct (x0, x1, y0, y1, n_cells) of the level-`level` cover
    of the given bbox expressions — same floor/clamp arithmetic as
    heatmap's cell ids."""
    n = 1 << level
    w, h = 360.0 / n, 180.0 / n
    last = n - 1
    x0 = f"least(cast(floor(({xmin} + 180.0) / {w!r}) as bigint), {last})"
    x1 = f"least(cast(floor(({xmax} + 180.0) / {w!r}) as bigint), {last})"
    y0 = f"least(cast(floor(({ymin} + 90.0) / {h!r}) as bigint), {last})"
    y1 = f"least(cast(floor(({ymax} + 90.0) / {h!r}) as bigint), {last})"
    return (
        f"named_struct('x0', {x0}, 'x1', {x1}, 'y0', {y0}, 'y1', {y1}, "
        f"'n', ({x1} - {x0} + 1) * ({y1} - {y0} + 1))"
    )


def shape_grid_cells(
    df: DataFrame,
    lat_col: str = "lats",
    lon_col: str = "lons",
    max_level: int = 8,
    max_cells: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, cell) rows: the bounding-box cover of each shape at its
    adaptive level. ``cell`` is ``"level/x/y"`` (the quad-tree term)."""
    if not 0 <= max_level <= MAX_LEVEL:
        raise ValueError(f"max_level must be in [0, {MAX_LEVEL}]")
    # stage the bbox and the per-level cover structs as named columns
    # FIRST: the CASE ladder then refers to tiny column references
    # instead of re-inlining the floor arithmetic (keeps the codegen'd
    # expression linear in max_level, not quadratic)
    staged = df.select(
        F.col(id_col),
        F.expr(f"array_min({lat_col})").alias("_ymin"),
        F.expr(f"array_max({lat_col})").alias("_ymax"),
        F.expr(f"array_min({lon_col})").alias("_xmin"),
        F.expr(f"array_max({lon_col})").alias("_xmax"),
    ).select(
        F.col(id_col),
        *[
            F.expr(
                _cover_bounds_col("_ymin", "_ymax", "_xmin", "_xmax", lvl)
            ).alias(f"_b{lvl}")
            for lvl in range(0, max_level + 1)
        ],
    )

    # CASE ladder, finest level first: the first level whose cover is
    # small enough wins (level 0 is one world cell — always fits)
    legs = " ".join(
        f"WHEN _b{lvl}.n <= {max_cells} "
        f"THEN struct({lvl} as lvl, _b{lvl} as b)"
        for lvl in range(max_level, 0, -1)
    )
    chosen: Column = F.expr(
        f"CASE {legs} ELSE struct(0 as lvl, _b0 as b) END"
    )

    cells = F.flatten(
        F.expr(
            "transform(sequence(_g.b.x0, _g.b.x1), x -> "
            "transform(sequence(_g.b.y0, _g.b.y1), y -> "
            "concat(_g.lvl, '/', x, '/', y)))"
        )
    )
    return (
        staged.select(F.col(id_col), chosen.alias("_g"))
        .select(F.col(id_col), F.explode(cells).alias("cell"))
    )


def cover_cells(
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    max_level: int = 8,
) -> List[str]:
    """The query box's probe set: its cover at every level 0..max_level
    (shapes indexed at any of those levels must be reachable)."""
    probes: List[str] = []
    for lvl in range(0, max_level + 1):
        x0, x1, y0, y1, *_ = snap_region(
            min_lat, max_lat, min_lon, max_lon, lvl
        )
        probes.extend(
            f"{lvl}/{x}/{y}"
            for x in range(x0, x1 + 1)
            for y in range(y0, y1 + 1)
        )
    return probes


def shape_grid_box_query(
    shapes: DataFrame,
    cells: DataFrame,
    box,
    relation: str = "intersects",
    lat_col: str = "lats",
    lon_col: str = "lons",
    id_col: str = "doc_id",
    max_level: int = 8,
    polygon: bool = False,
) -> DataFrame:
    """Box relation over grid-indexed shapes: probe-cell semi-join
    prunes to candidates, exact geometry refines. Results are
    IDENTICAL to the unindexed scan (the grid is a pure pre-filter);
    DISJOINT bypasses the grid (its matches live outside the probes).
    """
    if relation == "disjoint":
        return shapes.filter(
            (polygon_box_relation if polygon else line_box_relation)(
                lat_col, lon_col, box, relation
            )
        )
    probes = cover_cells(box[0], box[1], box[2], box[3], max_level)
    cand_ids = (
        cells.filter(F.col("cell").isin(probes)).select(id_col).distinct()
    )
    cand = shapes.join(cand_ids, id_col, "left_semi")
    rel = (polygon_box_relation if polygon else line_box_relation)(
        lat_col, lon_col, box, relation
    )
    return cand.filter(rel)
