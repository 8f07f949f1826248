"""LatLonShape: indexed line/polygon shapes queried by box relation.

Re-expression of
`lucene/core/src/java/org/apache/lucene/document/LatLonShape.java:79-141`
(`createIndexableFields(String, Line)` / `(String, Polygon)` +
`newBoxQuery(field, QueryRelation, ...)`) and the tessellated
triangle/BKD machinery behind it (`document/ShapeField.java`,
`geo/Component2D.java`): each document stores a SHAPE — a polyline or
a simple polygon ring — and a query box relates to it with INTERSECTS
/ WITHIN / DISJOINT (`ShapeField.QueryRelation`).

The Spark-native layout is two aligned array columns (lat[],
lon[]) per row; the relation evaluates as ONE boolean column built
from JVM higher-order functions over the implied segment list — no
UDF, no explode, no shuffle: a full-scan predicate exactly like the
point geo queries, and at 100 TB the same geohash-cell bucketing
(`geo.geohash_cell` over the shape's bounding box) gives the
partition-pruning locality BKD provides.

Geometry (identical arithmetic on the engine and DuckDB oracle side,
so gates hash-match):

- vertex-in-box: plain range conjunction;
- segment-segment intersection: orientation (cross-product) sign
  tests PLUS a bounding-box overlap guard, which makes the test exact
  for collinear segments too;
- WITHIN (shape inside box): every vertex in the box (a box is
  convex, so vertex containment implies edge containment);
- INTERSECTS (line): some vertex in the box OR some segment crosses a
  box edge;
- INTERSECTS (polygon): the ring test above OR a box corner lies
  inside the polygon (the box-entirely-inside-shape case,
  `Component2D.containsPoint` analog via even-odd ray cast);
- DISJOINT: NOT intersects (`LatLonShapeQuery` rewrites DISJOINT the
  same way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "line_box_relation",
    "polygon_box_relation",
    "shape_box_query",
    "oracle_line_box_sql",
    "oracle_polygon_box_sql",
    "line_polygon_relation",
    "polygon_polygon_relation",
    "shape_polygon_query",
    "oracle_line_polygon_sql",
    "oracle_polygon_polygon_sql",
]


def _inbox(y: str, x: str, box) -> str:
    min_lat, max_lat, min_lon, max_lon = (float(v) for v in box)
    return (
        f"({y} >= {min_lat!r} AND {y} <= {max_lat!r} "
        f"AND {x} >= {min_lon!r} AND {x} <= {max_lon!r})"
    )


def _orient(ax, ay, bx, by, cx, cy) -> str:
    """sign of the cross product (b-a) × (c-a)."""
    return (
        f"(({bx} - {ax}) * ({cy} - {ay}) - ({by} - {ay}) * ({cx} - {ax}))"
    )


def _segseg(ax, ay, bx, by, cx, cy, dx, dy) -> str:
    """Exact segment-segment intersection: opposite orientations on
    both sides + bounding-box overlap (the guard resolves the
    collinear cases the pure orientation test gets wrong)."""
    o1 = _orient(ax, ay, bx, by, cx, cy)
    o2 = _orient(ax, ay, bx, by, dx, dy)
    o3 = _orient(cx, cy, dx, dy, ax, ay)
    o4 = _orient(cx, cy, dx, dy, bx, by)
    bbox = (
        f"GREATEST({ax}, {bx}) >= LEAST({cx}, {dx}) "
        f"AND LEAST({ax}, {bx}) <= GREATEST({cx}, {dx}) "
        f"AND GREATEST({ay}, {by}) >= LEAST({cy}, {dy}) "
        f"AND LEAST({ay}, {by}) <= GREATEST({cy}, {dy})"
    )
    return f"({o1} * {o2} <= 0 AND {o3} * {o4} <= 0 AND {bbox})"


def _seg_box_pred(ay: str, ax: str, by: str, bx: str, box) -> str:
    """Segment [a, b] intersects the (convex) box: an endpoint inside,
    or a crossing with one of the four box edges."""
    min_lat, max_lat, min_lon, max_lon = (repr(float(v)) for v in box)
    corners = [
        (min_lon, min_lat, max_lon, min_lat),  # south edge
        (max_lon, min_lat, max_lon, max_lat),  # east
        (max_lon, max_lat, min_lon, max_lat),  # north
        (min_lon, max_lat, min_lon, min_lat),  # west
    ]
    crossings = " OR ".join(
        _segseg(ax, ay, bx, by, cx, cy, dx, dy) for cx, cy, dx, dy in corners
    )
    return f"({_inbox(ay, ax, box)} OR {_inbox(by, bx, box)} OR {crossings})"


# --- Spark side (higher-order functions over the vertex arrays) -----------


def _spark_segments(lat_col: str, lon_col: str, closed: bool) -> str:
    """SQL expr: array of segment structs (ay, ax, by, bx). For a
    closed ring the implicit closing edge wraps to vertex 0."""
    n = f"size({lat_col})"
    if closed:
        idx = f"sequence(0, {n} - 1)"
        nxt = f"(i + 1) % {n}"
    else:
        idx = f"sequence(0, {n} - 2)"
        nxt = "i + 1"
    return (
        f"transform({idx}, i -> struct("
        f"{lat_col}[i] AS ay, {lon_col}[i] AS ax, "
        f"{lat_col}[{nxt}] AS by, {lon_col}[{nxt}] AS bx))"
    )


def _within_col(lat_col: str, lon_col: str, box) -> Column:
    return F.expr(
        f"forall({lat_col}, y -> y >= {float(box[0])!r} AND y <= {float(box[1])!r})"
    ) & F.expr(
        f"forall({lon_col}, x -> x >= {float(box[2])!r} AND x <= {float(box[3])!r})"
    )


def _ring_intersects_col(lat_col: str, lon_col: str, box, closed: bool) -> Column:
    segs = _spark_segments(lat_col, lon_col, closed)
    pred = _seg_box_pred("s.ay", "s.ax", "s.by", "s.bx", box)
    return F.expr(f"exists({segs}, s -> {pred})")


def _corner_in_polygon_col(lat_col: str, lon_col: str, py: float, px: float) -> Column:
    """Even-odd ray cast of a CONSTANT point against the row's ring
    (same crossing rule as geo.polygon_query, per-row polygon)."""
    segs = _spark_segments(lat_col, lon_col, closed=True)
    py, px = repr(float(py)), repr(float(px))
    crossing = (
        f"CASE WHEN ((s.ay > {py}) != (s.by > {py})) "
        f"AND ({px} < ({py} - s.ay) * (s.bx - s.ax) / (s.by - s.ay) + s.ax) "
        f"THEN 1 ELSE 0 END"
    )
    return F.expr(
        f"aggregate({segs}, 0, (acc, s) -> acc + {crossing}) % 2 = 1"
    )


def line_box_relation(lat_col: str, lon_col: str, box, relation: str) -> Column:
    """Boolean Column: the row's POLYLINE (open vertex chain) stands in
    `relation` ('intersects' | 'within' | 'disjoint') to the box
    (min_lat, max_lat, min_lon, max_lon)."""
    if relation == "within":
        return _within_col(lat_col, lon_col, box)
    inter = _ring_intersects_col(lat_col, lon_col, box, closed=False)
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return ~inter
    raise ValueError(f"unknown shape relation {relation!r}")


def polygon_box_relation(lat_col: str, lon_col: str, box, relation: str) -> Column:
    """Boolean Column for a simple POLYGON ring (closing edge
    implicit): INTERSECTS adds the box-inside-polygon corner test."""
    if relation == "within":
        return _within_col(lat_col, lon_col, box)
    inter = _ring_intersects_col(lat_col, lon_col, box, closed=True) | (
        _corner_in_polygon_col(lat_col, lon_col, box[0], box[2])
    )
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return ~inter
    raise ValueError(f"unknown shape relation {relation!r}")


def shape_box_query(
    df: DataFrame,
    box,
    relation: str = "intersects",
    lat_col: str = "lats",
    lon_col: str = "lons",
    polygon: bool = False,
) -> DataFrame:
    """Rows whose shape stands in `relation` to the box. One scan, one
    codegen'd predicate."""
    rel = (polygon_box_relation if polygon else line_box_relation)(
        lat_col, lon_col, box, relation
    )
    return df.filter(rel)


# --- polygon QUERIES over indexed shapes (newPolygonQuery analog) ----------
#
# `LatLonShape.newPolygonQuery(field, QueryRelation, polygons...)`
# (`document/LatLonShape.java:141`): the query geometry is a simple
# polygon ring given as literal vertices, related to each row's
# stored line/polygon. The predicate text is generated ONCE with the
# query edges baked in as constants, identically for both engines:
#
# - point-in-query-polygon: even-odd ray cast UNROLLED over the
#   query's literal edges (the CASE guard keeps the division
#   unevaluated on horizontal edges);
# - INTERSECTS: some shape vertex inside the query polygon, or some
#   shape segment crossing some query edge; polygon shapes add the
#   query-vertex-inside-shape test (shape-contains-query);
# - WITHIN: every shape vertex inside the query polygon AND no edge
#   crossing (exact for concave query polygons too — vertex
#   containment alone only suffices for convex queries);
# - DISJOINT: NOT intersects (LatLonShapeQuery's own rewrite).


def _qpoly_edges(poly):
    n = len(poly)
    return [
        (
            repr(float(poly[i][0])),
            repr(float(poly[i][1])),
            repr(float(poly[(i + 1) % n][0])),
            repr(float(poly[(i + 1) % n][1])),
        )
        for i in range(n)
    ]


def _point_in_qpoly(y: str, x: str, poly) -> str:
    """Even-odd ray cast of point (y, x) against the LITERAL query
    ring, unrolled edge by edge (same crossing rule as the per-row
    ray cast in :func:`_corner_in_polygon_col`)."""
    terms = [
        f"(CASE WHEN (({ay} > {y}) <> ({by} > {y})) "
        f"AND ({x} < ({y} - {ay}) * ({bx} - {ax}) / ({by} - {ay}) + {ax}) "
        f"THEN 1 ELSE 0 END)"
        for ay, ax, by, bx in _qpoly_edges(poly)
    ]
    return f"((({' + '.join(terms)}) % 2) = 1)"


def _seg_qpoly_cross(ay: str, ax: str, by: str, bx: str, poly) -> str:
    """Shape segment [a, b] crosses some edge of the literal query
    ring."""
    return (
        "("
        + " OR ".join(
            _segseg(ax, ay, bx, by, qax, qay, qbx, qby)
            for qay, qax, qby, qbx in _qpoly_edges(poly)
        )
        + ")"
    )


def _spark_vertex_exists(lat_col: str, lon_col: str, pred_of_yx, negate=False) -> Column:
    """exists/forall over the row's vertices with a (y, x) predicate."""
    body = pred_of_yx(f"{lat_col}[i]", f"{lon_col}[i]")
    if negate:
        return F.expr(
            f"forall(sequence(0, size({lat_col}) - 1), i -> {body})"
        )
    return F.expr(f"exists(sequence(0, size({lat_col}) - 1), i -> {body})")


def _spark_seg_cross_qpoly(lat_col: str, lon_col: str, poly, closed: bool) -> Column:
    segs = _spark_segments(lat_col, lon_col, closed)
    pred = _seg_qpoly_cross("s.ay", "s.ax", "s.by", "s.bx", poly)
    return F.expr(f"exists({segs}, s -> {pred})")


def _shape_qpoly_relation(
    lat_col: str, lon_col: str, poly, relation: str, closed: bool
) -> Column:
    vert_in = _spark_vertex_exists(
        lat_col, lon_col, lambda y, x: _point_in_qpoly(y, x, poly)
    )
    crossing = _spark_seg_cross_qpoly(lat_col, lon_col, poly, closed)
    if relation == "within":
        all_in = _spark_vertex_exists(
            lat_col, lon_col, lambda y, x: _point_in_qpoly(y, x, poly), negate=True
        )
        return all_in & ~crossing
    inter = vert_in | crossing
    if closed:
        # shape-contains-query: one query vertex inside the row's ring
        inter = inter | _corner_in_polygon_col(
            lat_col, lon_col, poly[0][0], poly[0][1]
        )
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return ~inter
    raise ValueError(f"unknown shape relation {relation!r}")


def line_polygon_relation(lat_col: str, lon_col: str, poly, relation: str) -> Column:
    """Boolean Column: the row's POLYLINE vs the literal query polygon
    (list of (lat, lon) ring vertices, closing edge implicit)."""
    return _shape_qpoly_relation(lat_col, lon_col, poly, relation, closed=False)


def polygon_polygon_relation(
    lat_col: str, lon_col: str, poly, relation: str
) -> Column:
    """Boolean Column: the row's POLYGON ring vs the literal query
    polygon; INTERSECTS covers both containment directions."""
    return _shape_qpoly_relation(lat_col, lon_col, poly, relation, closed=True)


def shape_polygon_query(
    df: DataFrame,
    poly,
    relation: str = "intersects",
    lat_col: str = "lats",
    lon_col: str = "lons",
    polygon: bool = False,
) -> DataFrame:
    """Rows whose shape stands in `relation` to the query polygon. One
    scan, one codegen'd predicate."""
    rel = (polygon_polygon_relation if polygon else line_polygon_relation)(
        lat_col, lon_col, poly, relation
    )
    return df.filter(rel)


# --- DuckDB oracle side (LATERAL over segment indices) ---------------------


def _duck_seg_exists(lat: str, lon: str, box, closed: bool) -> str:
    """EXISTS over the row's segments with the SAME predicate text
    (DuckDB lists are 1-based)."""
    n = f"len({lat})"
    if closed:
        rng = f"generate_series(1, {n})"
        nxt = f"(i % {n}) + 1"
    else:
        rng = f"generate_series(1, {n} - 1)"
        nxt = "i + 1"
    pred = _seg_box_pred(
        f"{lat}[i]", f"{lon}[i]", f"{lat}[{nxt}]", f"{lon}[{nxt}]", box
    )
    return (
        f"EXISTS (SELECT 1 FROM (SELECT unnest({rng}) AS i) WHERE {pred})"
    )


def _duck_within(lat: str, lon: str, box) -> str:
    min_lat, max_lat, min_lon, max_lon = (repr(float(v)) for v in box)
    return (
        f"(NOT EXISTS (SELECT 1 FROM (SELECT unnest({lat}) AS y) "
        f"WHERE y < {min_lat} OR y > {max_lat}) "
        f"AND NOT EXISTS (SELECT 1 FROM (SELECT unnest({lon}) AS x) "
        f"WHERE x < {min_lon} OR x > {max_lon}))"
    )


def oracle_line_box_sql(lat: str, lon: str, box, relation: str) -> str:
    """DuckDB boolean expression mirroring :func:`line_box_relation`."""
    if relation == "within":
        return _duck_within(lat, lon, box)
    inter = _duck_seg_exists(lat, lon, box, closed=False)
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return f"NOT {inter}"
    raise ValueError(f"unknown shape relation {relation!r}")


def _duck_point_in_row_ring(lat: str, lon: str, py: float, px: float) -> str:
    """Even-odd ray cast of a CONSTANT point against the row's ring
    (DuckDB dual of :func:`_corner_in_polygon_col`)."""
    n = f"len({lat})"
    nxt = f"(i % {n}) + 1"
    py, px = repr(float(py)), repr(float(px))
    crossing = (
        f"CASE WHEN (({lat}[i] > {py}) <> ({lat}[{nxt}] > {py})) "
        f"AND ({px} < ({py} - {lat}[i]) * ({lon}[{nxt}] - {lon}[i]) "
        f"/ ({lat}[{nxt}] - {lat}[i]) + {lon}[i]) THEN 1 ELSE 0 END"
    )
    return (
        f"((SELECT coalesce(sum({crossing}), 0) "
        f"FROM (SELECT unnest(generate_series(1, {n})) AS i)) % 2 = 1)"
    )


def _duck_vertices_qpoly(lat: str, lon: str, poly, forall: bool) -> str:
    body = _point_in_qpoly(f"{lat}[i]", f"{lon}[i]", poly)
    rng = f"generate_series(1, len({lat}))"
    if forall:
        return (
            f"(NOT EXISTS (SELECT 1 FROM (SELECT unnest({rng}) AS i) "
            f"WHERE NOT {body}))"
        )
    return f"EXISTS (SELECT 1 FROM (SELECT unnest({rng}) AS i) WHERE {body})"


def _duck_seg_cross_qpoly(lat: str, lon: str, poly, closed: bool) -> str:
    n = f"len({lat})"
    if closed:
        rng = f"generate_series(1, {n})"
        nxt = f"(i % {n}) + 1"
    else:
        rng = f"generate_series(1, {n} - 1)"
        nxt = "i + 1"
    pred = _seg_qpoly_cross(
        f"{lat}[i]", f"{lon}[i]", f"{lat}[{nxt}]", f"{lon}[{nxt}]", poly
    )
    return f"EXISTS (SELECT 1 FROM (SELECT unnest({rng}) AS i) WHERE {pred})"


def _oracle_qpoly_relation(
    lat: str, lon: str, poly, relation: str, closed: bool
) -> str:
    if relation == "within":
        return (
            f"({_duck_vertices_qpoly(lat, lon, poly, forall=True)} "
            f"AND NOT {_duck_seg_cross_qpoly(lat, lon, poly, closed)})"
        )
    inter = (
        f"({_duck_vertices_qpoly(lat, lon, poly, forall=False)} "
        f"OR {_duck_seg_cross_qpoly(lat, lon, poly, closed)}"
    )
    if closed:
        inter += f" OR {_duck_point_in_row_ring(lat, lon, poly[0][0], poly[0][1])}"
    inter += ")"
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return f"NOT {inter}"
    raise ValueError(f"unknown shape relation {relation!r}")


def oracle_line_polygon_sql(lat: str, lon: str, poly, relation: str) -> str:
    """DuckDB boolean expression mirroring :func:`line_polygon_relation`."""
    return _oracle_qpoly_relation(lat, lon, poly, relation, closed=False)


def oracle_polygon_polygon_sql(lat: str, lon: str, poly, relation: str) -> str:
    """DuckDB boolean expression mirroring
    :func:`polygon_polygon_relation`."""
    return _oracle_qpoly_relation(lat, lon, poly, relation, closed=True)


def oracle_polygon_box_sql(lat: str, lon: str, box, relation: str) -> str:
    """DuckDB boolean expression mirroring :func:`polygon_box_relation`."""
    if relation == "within":
        return _duck_within(lat, lon, box)
    n = f"len({lat})"
    nxt = f"(i % {n}) + 1"
    py, px = repr(float(box[0])), repr(float(box[2]))
    crossing = (
        f"CASE WHEN (({lat}[i] > {py}) <> ({lat}[{nxt}] > {py})) "
        f"AND ({px} < ({py} - {lat}[i]) * ({lon}[{nxt}] - {lon}[i]) "
        f"/ ({lat}[{nxt}] - {lat}[i]) + {lon}[i]) THEN 1 ELSE 0 END"
    )
    corner = (
        f"((SELECT coalesce(sum({crossing}), 0) "
        f"FROM (SELECT unnest(generate_series(1, {n})) AS i)) % 2 = 1)"
    )
    inter = f"({_duck_seg_exists(lat, lon, box, closed=True)} OR {corner})"
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return f"NOT {inter}"
    raise ValueError(f"unknown shape relation {relation!r}")
