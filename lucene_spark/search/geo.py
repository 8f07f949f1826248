"""Geo-spatial queries (LatLonPoint analog).

`lucene/core/src/java/org/apache/lucene/document/LatLonPoint.java:60-103`
offers newBoxQuery / newDistanceQuery / nearest over a BKD tree of
quantized (lat, lon) points. The Spark re-expression:

- **Box query** — a pure predicate on the lat/lon columns: Catalyst
  pushes it into the parquet scan (row-group min/max pruning plays the
  BKD role, exactly like PointRangeQuery). Anti-meridian-crossing
  boxes split into two lon ranges, as `LatLonPoint.newBoxQuery` does.
- **Distance query** — haversine distance ≤ radius, evaluated as a
  JVM-side column expression, PRE-FILTERED by the circle's bounding
  box so the trig only runs on candidates the scan already pruned to
  (`LatLonPointDistanceQuery` does the same box-first check).
- **Nearest-k** — distance sort + `TakeOrderedAndProject`.
- **Scale path**: :func:`geohash_cell` assigns a prefix-truncatable
  cell id; writing the table partitioned/bucketed by cell turns any
  box/distance query into partition pruning + a small cell-set scan —
  the distributed stand-in for BKD's spatial locality.

All distances use the haversine great-circle formula on a spherical
earth (R = 6371008.7714 m, the mean radius Lucene's SloppyMath uses).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "EARTH_MEAN_RADIUS_METERS",
    "haversine_meters",
    "box_query",
    "distance_query",
    "nearest_k",
    "geohash_cell",
    "polygon_query",
    "polygon_contains_sql",
]

EARTH_MEAN_RADIUS_METERS = 6371008.7714


def haversine_meters(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters, all-JVM (codegen'd trig)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * EARTH_MEAN_RADIUS_METERS) * F.asin(F.sqrt(a))


def box_query(
    df: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Points inside the (inclusive) box; a min_lon > max_lon box
    crosses the anti-meridian and splits into two lon ranges."""
    lat_ok = (F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat)
    if min_lon <= max_lon:
        lon_ok = (F.col(lon_col) >= min_lon) & (F.col(lon_col) <= max_lon)
    else:  # dateline crossing: [min_lon, 180] ∪ [-180, max_lon]
        lon_ok = (F.col(lon_col) >= min_lon) | (F.col(lon_col) <= max_lon)
    return df.filter(lat_ok & lon_ok)


def _bounding_box(lat: float, lon: float, radius_m: float) -> Tuple[float, float, float, float]:
    """Conservative bounding box of a circle (degrees)."""
    import math

    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_METERS)
    # widen the lon delta by the worst-case cos(lat) inside the box
    max_abs_lat = min(90.0, abs(lat) + dlat)
    cos_lat = max(math.cos(math.radians(max_abs_lat)), 1e-9)
    dlon = math.degrees(radius_m / (EARTH_MEAN_RADIUS_METERS * cos_lat))
    return (
        max(lat - dlat, -90.0),
        min(lat + dlat, 90.0),
        lon - dlon,
        lon + dlon,
    )


def distance_query(
    df: DataFrame,
    lat: float,
    lon: float,
    radius_meters: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Points within `radius_meters` of (lat, lon): bounding-box
    pre-filter (pushdown-friendly, prunes the scan) then exact
    haversine on survivors — `LatLonPointDistanceQuery`'s two-phase
    check."""
    lo_lat, hi_lat, lo_lon, hi_lon = _bounding_box(lat, lon, radius_meters)
    if lo_lon < -180.0 or hi_lon > 180.0:
        boxed = df  # circle wraps the dateline; skip the box phase
    else:
        boxed = box_query(df, lo_lat, hi_lat, lo_lon, hi_lon, lat_col, lon_col)
    dist = haversine_meters(
        F.col(lat_col), F.col(lon_col), F.lit(float(lat)), F.lit(float(lon))
    )
    return boxed.filter(dist <= radius_meters)


def nearest_k(
    df: DataFrame,
    lat: float,
    lon: float,
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """k nearest points: (id, distance_m) asc, ties by id
    (`LatLonPoint.nearest`); `TakeOrderedAndProject`, no global sort."""
    dist = haversine_meters(
        F.col(lat_col), F.col(lon_col), F.lit(float(lat)), F.lit(float(lon))
    )
    return (
        df.select(F.col(id_col), dist.alias("distance_m"))
        .orderBy(F.col("distance_m").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("distance_m", 3).alias("distance_m"))
    )


def _polygon_edges(vertices):
    """Per-edge (y1, y2, x1, slope) with the slope precomputed in
    Python so engine and oracle fold the SAME double constants."""
    n = len(vertices)
    if n < 3:
        raise ValueError("polygon needs >= 3 vertices")
    edges = []
    for i in range(n):
        y1, x1 = float(vertices[i][0]), float(vertices[i][1])
        y2, x2 = (
            float(vertices[(i + 1) % n][0]),
            float(vertices[(i + 1) % n][1]),
        )
        slope = (x2 - x1) / (y2 - y1) if y2 != y1 else 0.0
        edges.append((y1, y2, x1, slope))
    return edges


def polygon_query(
    df: DataFrame,
    vertices,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Points inside a simple polygon (`document/LatLonShape.java`
    point-in-polygon semantics; `geo/Polygon2D` even-odd crossing
    rule): ray-cast parity, unrolled over the polygon's edges as one
    JVM boolean expression — no UDF — behind a bounding-box
    pre-filter that pushes to the scan (the Component2D bounding-box
    fast-reject).

    `vertices` is [(lat, lon), ...] in order (either winding); the
    closing edge is implicit. Horizontal edges never cross the
    half-open ray test, matching the standard even-odd rule.
    """
    lats = [v[0] for v in vertices]
    lons = [v[1] for v in vertices]
    boxed = box_query(
        df, min(lats), max(lats), min(lons), max(lons), lat_col, lon_col
    )
    y, x = F.col(lat_col), F.col(lon_col)
    crossings = None
    for y1, y2, x1, slope in _polygon_edges(vertices):
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        cross = F.when(
            straddles & (x < (y - F.lit(y1)) * F.lit(slope) + F.lit(x1)),
            F.lit(1),
        ).otherwise(F.lit(0))
        crossings = cross if crossings is None else crossings + cross
    return boxed.filter(crossings % 2 == 1)


def polygon_contains_sql(
    vertices, lat_expr: str = "lat", lon_expr: str = "lon"
) -> str:
    """The SAME even-odd test as :func:`polygon_query`, as an ANSI SQL
    boolean expression (for DuckDB oracles): identical constants,
    identical arithmetic shape, so engine and oracle agree bit-exactly
    away from polygon boundaries."""
    parts = []
    for y1, y2, x1, slope in _polygon_edges(vertices):
        parts.append(
            f"(CASE WHEN (({y1!r} > {lat_expr}) <> ({y2!r} > {lat_expr})) "
            f"AND ({lon_expr} < ({lat_expr} - {y1!r}) * {slope!r} + {x1!r}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(parts) + ") % 2 = 1"


_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cell(
    lat_col: Column, lon_col: Column, precision: int = 6
) -> Column:
    """Standard geohash (interleaved bit subdivision, base32) as a
    column expression — the spatial partitioning key for bucketed
    layouts. Computed via integer bit math, fully JVM-side.
    """
    nbits = precision * 5
    lat_bits = nbits // 2
    lon_bits = nbits - lat_bits
    lat_q = F.floor(
        (lat_col + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))
    ).cast("long")
    lat_q = F.least(F.lit((1 << lat_bits) - 1), F.greatest(F.lit(0), lat_q))
    lon_q = F.floor(
        (lon_col + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))
    ).cast("long")
    lon_q = F.least(F.lit((1 << lon_bits) - 1), F.greatest(F.lit(0), lon_q))
    # interleave: even bit positions (from MSB) are lon, odd are lat
    interleaved = F.lit(0).cast("long")
    for i in range(nbits):
        from_lon = i % 2 == 0
        src = lon_q if from_lon else lat_q
        src_bits = lon_bits if from_lon else lat_bits
        bit_idx = src_bits - 1 - (i // 2)
        bit = F.shiftrightunsigned(src, bit_idx).bitwiseAND(F.lit(1))
        interleaved = F.shiftleft(interleaved, 1).bitwiseOR(bit)
    # base32 encode, 5 bits per char
    chars = [
        F.substring(
            F.lit(_BASE32),
            (
                F.shiftrightunsigned(interleaved, 5 * (precision - 1 - c))
                .bitwiseAND(F.lit(31))
                + 1
            ).cast("int"),
            1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)
