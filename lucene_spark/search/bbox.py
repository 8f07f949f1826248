"""BBox strategy: per-document bounding boxes with relation queries
and overlap-ratio relevance.

`lucene/spatial-extras/src/java/org/apache/lucene/spatial/bbox/
BBoxStrategy.java` stores one rectangle per document in four numeric
fields and answers box relations plus a 0-1 overlap-ratio score
(`bbox/BBoxOverlapRatioValueSource.java:70`):

    queryRatio  = intersectionArea / queryArea      (lines/points: see below)
    targetRatio = intersectionArea / targetArea
    score       = queryRatio * p + targetRatio * (1 - p)

with ``p = queryTargetProportion`` (GeoPortal default 0.25) and every
area computed as ``max(minSideLength, w) * max(minSideLength, h)`` so
degenerate line/point boxes can still rank. Degenerate extents fall
back exactly like the reference: a zero-area QUERY scores by height
ratio (vertical line), then width ratio (horizontal line), then
intersects∈{0,1}; same for a zero-area target.

The Spark re-expression stores (min_lat, max_lat, min_lon, max_lon)
columns; the relation predicate and the score are each ONE codegen'd
SQL expression, emitted once and consumed verbatim by both the Spark
plan (`F.expr`) and the DuckDB oracle — no UDF, no shuffle, and the
range predicates push into the parquet scan (row-group min/max play
the numeric-field role of the reference's points).

Dateline crossing: the reference encodes an XDL box as minX > maxX
and splits score width into west+east legs
(BBoxOverlapRatioValueSource.java:158-204). This module supports an
XDL QUERY box through the same two-leg width; stored boxes are assumed
normalized (min_lon <= max_lon) — the ingest normalization every
non-XDL corpus satisfies — and that boundary is documented here
rather than silently mishandled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "bbox_relation_sql",
    "bbox_relation",
    "bbox_query",
    "bbox_overlap_score_sql",
    "bbox_overlap_topk",
]

_COLS = ("min_lat", "max_lat", "min_lon", "max_lon")


def _q(v: float) -> str:
    return repr(float(v))


def bbox_relation_sql(qbox, relation: str, cols=_COLS) -> str:
    """Boolean SQL for box `relation` against the stored box columns.

    `qbox` = (min_lat, max_lat, min_lon, max_lon), non-XDL. Relations
    follow `BBoxStrategy.makeQuery`: intersects / within (doc inside
    query) / contains (doc contains query) / disjoint.
    """
    ymin, ymax, xmin, xmax = cols
    qy0, qy1, qx0, qx1 = (_q(qbox[0]), _q(qbox[1]), _q(qbox[2]), _q(qbox[3]))
    inter = (
        f"({ymin} <= {qy1} AND {ymax} >= {qy0} "
        f"AND {xmin} <= {qx1} AND {xmax} >= {qx0})"
    )
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return f"NOT {inter}"
    if relation == "within":
        return (
            f"({ymin} >= {qy0} AND {ymax} <= {qy1} "
            f"AND {xmin} >= {qx0} AND {xmax} <= {qx1})"
        )
    if relation == "contains":
        return (
            f"({ymin} <= {qy0} AND {ymax} >= {qy1} "
            f"AND {xmin} <= {qx0} AND {xmax} >= {qx1})"
        )
    raise ValueError(f"unknown relation {relation!r}")


def bbox_relation(qbox, relation: str, cols=_COLS) -> Column:
    return F.expr(bbox_relation_sql(qbox, relation, cols))


def bbox_query(
    df: DataFrame, qbox, relation: str = "intersects", cols=_COLS
) -> DataFrame:
    """Rows whose stored box stands in `relation` to `qbox` — one
    pushdown-able predicate."""
    return df.filter(bbox_relation(qbox, relation, cols))


def bbox_overlap_score_sql(
    qbox,
    query_target_proportion: float = 0.25,
    min_side_length: float = 0.0,
    cols=_COLS,
) -> str:
    """The overlap-ratio score as one SQL expression (dual-emitted).

    Mirrors BBoxOverlapRatioValueSource.score() including the XDL query
    two-leg width, the dateline-adjacency zero-width case, the
    minSideLength'd areas, and the line/point ratio fallbacks."""
    if not 0.0 <= query_target_proportion <= 1.0:
        raise ValueError("queryTargetProportion must be in [0, 1]")
    ymin, ymax, xmin, xmax = cols
    qy0, qy1 = float(qbox[0]), float(qbox[1])
    qx0, qx1 = float(qbox[2]), float(qbox[3])
    q_xdl = qx0 > qx1  # reference encoding of a dateline-crossing box
    ms = float(min_side_length)
    p = float(query_target_proportion)

    height = f"(least({_q(qy1)}, {ymax}) - greatest({_q(qy0)}, {ymin}))"
    if q_xdl:
        # query crosses, target doesn't (stored boxes are normalized):
        # west leg [qx0, 180], east leg [-180, qx1]; BOTH legs empty is
        # a hard no-intersection (ref :197-200), not a zero width
        west = f"(least({_q(180.0)}, {xmax}) - greatest({_q(qx0)}, {xmin}))"
        east = f"(least({_q(qx1)}, {xmax}) - greatest({_q(-180.0)}, {xmin}))"
        width = (
            f"(CASE WHEN {west} < 0 AND {east} < 0 THEN -1.0 "
            f"ELSE greatest({west}, 0.0) + greatest({east}, 0.0) END)"
        )
        q_width = (180.0 - qx0) + (qx1 + 180.0)
    else:
        left = f"greatest({_q(qx0)}, {xmin})"
        right = f"least({_q(qx1)}, {xmax})"
        # dateline-adjacent boxes overlap with width 0 (ref :160-164)
        adj = (
            f"(({_q(abs(qx0))} = 180.0 OR {_q(abs(qx1))} = 180.0) "
            f"AND (abs({xmin}) = 180.0 OR abs({xmax}) = 180.0))"
        )
        width = (
            f"(CASE WHEN {left} <= {right} THEN {right} - {left} "
            f"WHEN {adj} THEN 0.0 ELSE -1.0 END)"
        )
        q_width = qx1 - qx0
    q_height = qy1 - qy0
    q_area = max(ms, q_width) * max(ms, q_height)

    # the intersection extents are inlined (no lambda let-binding: the
    # expression must parse verbatim in BOTH Spark SQL and DuckDB)
    w, h = width, height
    area = f"(greatest({_q(ms)}, {w}) * greatest({_q(ms)}, {h}))"
    t_width = f"({xmax} - {xmin})"
    t_height = f"({ymax} - {ymin})"
    t_area = f"(greatest({_q(ms)}, {t_width}) * greatest({_q(ms)}, {t_height}))"

    if q_area > 0:
        q_ratio = f"({area} / {_q(q_area)})"
    elif q_height > 0:
        q_ratio = f"({h} / {_q(q_height)})"
    elif q_width > 0:
        q_ratio = f"({w} / {_q(q_width)})"
    else:
        q_ratio = "1.0"  # point query that reached here intersects

    t_ratio = (
        f"(CASE WHEN {t_area} > 0 THEN {area} / {t_area} "
        f"WHEN {t_height} > 0 THEN {h} / {t_height} "
        f"WHEN {t_width} > 0 THEN {w} / {t_width} "
        f"ELSE 1.0 END)"
    )
    return (
        f"(CASE WHEN {h} < 0 OR {w} < 0 THEN 0.0 "
        f"ELSE {q_ratio} * {_q(p)} + {t_ratio} * {_q(1.0 - p)} END)"
    )


def bbox_overlap_topk(
    df: DataFrame,
    qbox,
    k: int = 10,
    query_target_proportion: float = 0.25,
    min_side_length: float = 0.0,
    id_col: str = "doc_id",
    cols=_COLS,
) -> DataFrame:
    """Top-k docs by overlap ratio with `qbox` (zero scores dropped,
    like the no-match explanation): one codegen'd projection +
    TakeOrderedAndProject."""
    score = F.expr(
        bbox_overlap_score_sql(
            qbox, query_target_proportion, min_side_length, cols
        )
    )
    return (
        df.select(F.col(id_col), score.alias("_s"))
        .filter(F.col("_s") > 0.0)
        .orderBy(F.col("_s").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("_s", 6).alias("score"))
    )
