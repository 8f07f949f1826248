"""Spatial heatmap faceting (HeatmapFacetCounter analog).

`lucene/spatial-extras/src/java/org/apache/lucene/spatial/prefix/
HeatmapFacetCounter.java:40` aggregates indexed points into a 2-D grid
of counts at a chosen prefix-tree ``facetLevel``: the caller passes a
region and a level, the counter walks the tree's cells at that level
and returns a ``columns x rows`` array whose region is the input
region EXPANDED outward to the level's cell boundaries (edge cells
that merely overlap are included).

The Spark re-expression keeps the quad-tree cell algebra (level ``L``
halves the world per axis, so cell width = 360/2^L and height =
180/2^L, exactly the aspect of a quad SpatialPrefixTree over the
geo world bounds) but computes the counts as ONE partially-aggregated
``groupBy`` over codegen'd integer cell ids — no tree walk, no
per-cell term seek, and the result is SPARSE (zero cells are absent;
the reference materializes a dense int array and trips
``MAX_ROWS_OR_COLUMNS`` guards that a sparse frame never needs):

- the snapped region filter is a plain range predicate on the lat/lon
  columns, so Catalyst pushes it into the parquet scan (row-group
  min/max pruning plays the role the prefix-tree's cell seek plays in
  the reference);
- the cell-id arithmetic is emitted ONCE as SQL text consumed by both
  the Spark plan (`F.expr`) and the DuckDB oracle, so the gate
  comparison exercises the identical floor/clamp math end to end;
- counts combine map-side (partial aggregation) before the single
  shuffle on (grid_x, grid_y) — at 100 TB the shuffle carries at most
  ``2^L * 2^L`` rows per partition, not the points.

Cell-boundary semantics: cells are half-open ``[min, max)`` on each
axis except at the world's +edge (lon=180, lat=90), which folds into
the last cell — the same convention the reference's tree cells use for
point containment.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "cell_size",
    "snap_region",
    "heatmap_counts",
    "heatmap_counts_sql",
]

# Lucene guards columns*rows against MAX_ARRAY_LENGTH because it
# materializes a dense array (HeatmapFacetCounter.java:45). The sparse
# frame has no such limit, but levels beyond 26 exceed double-precision
# lat/lon resolution anyway, so keep the reference's spirit of a guard.
MAX_LEVEL = 26


def cell_size(level: int) -> Tuple[float, float]:
    """(cell_width_deg, cell_height_deg) of the quad tree at `level`."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    n = 1 << level
    return 360.0 / n, 180.0 / n


def _gx_sql(lon_expr: str, level: int) -> str:
    w, _ = cell_size(level)
    last = (1 << level) - 1
    # floor via cast-to-bigint is unsafe for negatives; inputs are
    # shifted non-negative first so floor() is exact in both engines.
    return f"least(cast(floor(({lon_expr} + 180.0) / {w!r}) as bigint), {last})"


def _gy_sql(lat_expr: str, level: int) -> str:
    _, h = cell_size(level)
    last = (1 << level) - 1
    return f"least(cast(floor(({lat_expr} + 90.0) / {h!r}) as bigint), {last})"


def snap_region(
    min_lat: float, max_lat: float, min_lon: float, max_lon: float, level: int
) -> Tuple[int, int, int, int, float, float, float, float]:
    """Expand the region outward to cell boundaries at `level`.

    Returns (x0, x1, y0, y1, snapped_min_lat, snapped_max_lat,
    snapped_min_lon, snapped_max_lon): the inclusive cell-index ranges
    and the snapped (expanded) geographic bounds — the reference's
    "actual heatmap area will usually be larger" contract.
    """
    w, h = cell_size(level)
    last = (1 << level) - 1

    def _cell(v: float, origin: float, size: float) -> int:
        return min(int((v + origin) // size), last)

    x0, x1 = _cell(min_lon, 180.0, w), _cell(max_lon, 180.0, w)
    y0, y1 = _cell(min_lat, 90.0, h), _cell(max_lat, 90.0, h)
    return (
        x0,
        x1,
        y0,
        y1,
        y0 * h - 90.0,
        (y1 + 1) * h - 90.0,
        x0 * w - 180.0,
        (x1 + 1) * w - 180.0,
    )


def heatmap_counts(
    df: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    level: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Grid-facet the points of `df` inside the snapped region.

    Returns a sparse frame (grid_x, grid_y, cnt) — one row per
    NON-EMPTY cell of the level-`level` quad grid overlapping the
    input region (the dense ``getCount(x, y)`` of the reference is a
    lookup into this frame; absent = 0).
    """
    x0, x1, y0, y1, slat0, slat1, slon0, slon1 = snap_region(
        min_lat, max_lat, min_lon, max_lon, level
    )
    gx = F.expr(_gx_sql(lon_col, level))
    gy = F.expr(_gy_sql(lat_col, level))
    # range predicate on the raw columns first: pushdown-able; the +edge
    # of the world folds in via <= when the snapped bound reaches it
    lon_hi = (
        (F.col(lon_col) <= 180.0) if slon1 >= 180.0 else (F.col(lon_col) < slon1)
    )
    lat_hi = (
        (F.col(lat_col) <= 90.0) if slat1 >= 90.0 else (F.col(lat_col) < slat1)
    )
    return (
        df.filter(
            (F.col(lon_col) >= slon0)
            & lon_hi
            & (F.col(lat_col) >= slat0)
            & lat_hi
        )
        .select(gx.alias("grid_x"), gy.alias("grid_y"))
        .filter(
            (F.col("grid_x").between(x0, x1)) & (F.col("grid_y").between(y0, y1))
        )
        .groupBy("grid_x", "grid_y")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def heatmap_counts_sql(
    source_sql: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    level: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """ANSI-SQL emission of :func:`heatmap_counts` (DuckDB oracle) —
    the identical cell arithmetic as the Spark plan, by construction
    (both consume `_gx_sql`/`_gy_sql`)."""
    x0, x1, y0, y1, slat0, slat1, slon0, slon1 = snap_region(
        min_lat, max_lat, min_lon, max_lon, level
    )
    lon_hi = (
        f"{lon_col} <= 180.0" if slon1 >= 180.0 else f"{lon_col} < {slon1!r}"
    )
    lat_hi = f"{lat_col} <= 90.0" if slat1 >= 90.0 else f"{lat_col} < {slat1!r}"
    return f"""
WITH cells AS (
  SELECT {_gx_sql(lon_col, level)} AS grid_x,
         {_gy_sql(lat_col, level)} AS grid_y
  FROM ({source_sql})
  WHERE {lon_col} >= {slon0!r} AND {lon_hi}
    AND {lat_col} >= {slat0!r} AND {lat_hi}
)
SELECT grid_x, grid_y, count(*) AS cnt
FROM cells
WHERE grid_x BETWEEN {x0} AND {x1} AND grid_y BETWEEN {y0} AND {y1}
GROUP BY grid_x, grid_y
"""
