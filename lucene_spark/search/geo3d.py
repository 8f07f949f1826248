"""spatial3d / geo3d analog: ellipsoid-exact surface distance.

Reference: `lucene/spatial3d/src/java/org/apache/lucene/spatial3d/
Geo3DPoint.java:48` over `geom/PlanetModel.java` — the spatial3d
module's differentiator vs `LatLonPoint` is the planet model: points
live on a configurable ellipsoid (SPHERE / WGS84 / CLARKE_1866) and
`PlanetModel.surfaceDistance` (`PlanetModel.java:469`) runs Vincenty's
inverse formula, exact on the ellipsoid, instead of haversine's
spherical approximation (~0.5% error, up to ~21 km at antipodal
scale). The 2D paths live in `search/geo.py`; this module adds the
ellipsoid-exact distance and the unit-ellipsoid XYZ encoding.

Execution shape: Vincenty's fixed-point iteration converges in < 6
rounds for non-antipodal pairs, so it UNROLLS — the loop becomes a
straight-line dataflow of ~90 arithmetic/trig steps emitted ONCE as
SQL expression strings and consumed twice: `F.expr` per step on the
Spark side (whole-stage codegen, no Python in the row loop) and
nested subqueries on the DuckDB side (`oracle_geo3d_nearest_sql`).
One emission → bit-identical operation structure → value-hash parity.
The NaN guard for the equatorial line (`cos2SigmaM` when
cosSqAlpha == 0, `PlanetModel.java:497-499`) becomes a CASE.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "PlanetModel",
    "SPHERE",
    "WGS84",
    "CLARKE_1866",
    "geo3d_xyz",
    "geo3d_nearest",
    "oracle_geo3d_nearest_sql",
]


@dataclass(frozen=True)
class PlanetModel:
    """Ellipsoid x²/a² + y²/a² + z²/b² = 1 (`PlanetModel.java:28`;
    geo3d supports only a == b in the xy plane)."""

    a: float
    b: float

    @property
    def scaled_flattening(self) -> float:
        return (self.a - self.b) / self.a

    @property
    def mean_radius(self) -> float:
        # (2a + b) / 3, Geodetic Reference System 1980 (PlanetModel.java:76)
        return (2.0 * self.a + self.b) / 3.0


SPHERE = PlanetModel(6371008.7714, 6371008.7714)  # GRS80 mean radius, f=0
WGS84 = PlanetModel(6378137.0, 6356752.314245)
CLARKE_1866 = PlanetModel(6378206.4, 6356583.8)

_ITERS = 8  # fixed unroll; Vincenty converges < 6 rounds non-antipodal


def _vincenty_steps(
    lat_col: str, lon_col: str, qlat: float, qlon: float, planet: PlanetModel
) -> Tuple[List[Tuple[str, str]], str]:
    """(ordered [(name, sql_expr)], final_distance_expr): the unrolled
    Vincenty inverse (PlanetModel.java:469-541), one emission for both
    engines. Constants are folded in Python so Spark and DuckDB parse
    the SAME literals."""
    f = planet.scaled_flattening
    steps: List[Tuple[str, str]] = [
        ("_vl", f"radians({qlon!r}) - radians({lon_col})"),
        ("_vu1", f"atan({1.0 - f!r} * tan(radians({lat_col})))"),
        ("_vu2", f"atan({1.0 - f!r} * tan(radians({qlat!r})))"),
        ("_vsu1", "sin(_vu1)"),
        ("_vcu1", "cos(_vu1)"),
        ("_vsu2", "sin(_vu2)"),
        ("_vcu2", "cos(_vu2)"),
        ("_vlam0", "_vl"),
    ]
    last = 0
    for i in range(_ITERS):
        p = f"_vlam{i}"
        steps += [
            (f"_vsl{i}", f"sin({p})"),
            (f"_vcl{i}", f"cos({p})"),
            (
                f"_vss{i}",
                f"sqrt((_vcu2 * _vsl{i}) * (_vcu2 * _vsl{i}) + "
                f"(_vcu1 * _vsu2 - _vsu1 * _vcu2 * _vcl{i}) * "
                f"(_vcu1 * _vsu2 - _vsu1 * _vcu2 * _vcl{i}))",
            ),
            (f"_vcs{i}", f"_vsu1 * _vsu2 + _vcu1 * _vcu2 * _vcl{i}"),
            (f"_vsig{i}", f"atan2(_vss{i}, _vcs{i})"),
            (
                f"_vsa{i}",
                f"CASE WHEN _vss{i} = 0.0 THEN 0.0 "
                f"ELSE _vcu1 * _vcu2 * _vsl{i} / _vss{i} END",
            ),
            (f"_vc2a{i}", f"1.0 - _vsa{i} * _vsa{i}"),
            # equatorial-line NaN guard (PlanetModel.java:497-499)
            (
                f"_vc2sm{i}",
                f"CASE WHEN _vc2a{i} = 0.0 THEN 0.0 "
                f"ELSE _vcs{i} - 2.0 * _vsu1 * _vsu2 / _vc2a{i} END",
            ),
            (
                f"_vcc{i}",
                f"{f / 16.0!r} * _vc2a{i} * "
                f"(4.0 + {f!r} * (4.0 - 3.0 * _vc2a{i}))",
            ),
            (
                f"_vlam{i + 1}",
                f"_vl + (1.0 - _vcc{i}) * {f!r} * _vsa{i} * (_vsig{i} + "
                f"_vcc{i} * _vss{i} * (_vc2sm{i} + _vcc{i} * _vcs{i} * "
                f"(-1.0 + 2.0 * _vc2sm{i} * _vc2sm{i})))",
            ),
        ]
        last = i
    sq_ratio = (planet.a * planet.a - planet.b * planet.b) / (
        planet.b * planet.b
    )
    i = last
    steps += [
        ("_vusq", f"_vc2a{i} * {sq_ratio!r}"),
        (
            "_va",
            "1.0 + _vusq / 16384.0 * (4096.0 + _vusq * "
            "(-768.0 + _vusq * (320.0 - 175.0 * _vusq)))",
        ),
        (
            "_vb",
            "_vusq / 1024.0 * (256.0 + _vusq * "
            "(-128.0 + _vusq * (74.0 - 47.0 * _vusq)))",
        ),
        (
            "_vdsig",
            f"_vb * _vss{i} * (_vc2sm{i} + _vb / 4.0 * (_vcs{i} * "
            f"(-1.0 + 2.0 * _vc2sm{i} * _vc2sm{i}) - _vb / 6.0 * _vc2sm{i} * "
            f"(-3.0 + 4.0 * _vss{i} * _vss{i}) * "
            f"(-3.0 + 4.0 * _vc2sm{i} * _vc2sm{i})))",
        ),
    ]
    final = (
        f"CASE WHEN _vss{i} = 0.0 THEN 0.0 "
        f"ELSE {planet.b!r} * _va * (_vsig{i} - _vdsig) END"
    )
    return steps, final


def geo3d_xyz(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    planet: PlanetModel = WGS84,
) -> DataFrame:
    """Append the scaled-ellipsoid (x, y, z) encoding of each point
    (`GeoPoint(planetModel, lat, lon)`: geodetic latitude → the
    surface point via the reduced-latitude construction). Codegen'd
    trig, no UDF."""
    f = planet.scaled_flattening
    # reduced latitude: tan(U) = (1-f) tan(lat)
    u = F.atan((1.0 - f) * F.tan(F.radians(F.col(lat_col))))
    lam = F.radians(F.col(lon_col))
    return (
        df.withColumn("x", F.lit(planet.a) * F.cos(u) * F.cos(lam))
        .withColumn("y", F.lit(planet.a) * F.cos(u) * F.sin(lam))
        .withColumn("z", F.lit(planet.b) * F.sin(u))
    )


def geo3d_nearest(
    df: DataFrame,
    lat: float,
    lon: float,
    k: int = 10,
    planet: PlanetModel = WGS84,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """k nearest by ellipsoid-exact Vincenty surface distance
    (Geo3DPoint.newDistanceQuery / nearest over PlanetModel.WGS84):
    (id, distance_m) asc, ties by id; TakeOrderedAndProject top-k,
    every step whole-stage codegen."""
    steps, final = _vincenty_steps(lat_col, lon_col, float(lat), float(lon), planet)
    out = df.select(id_col, lat_col, lon_col)
    for name, expr in steps:
        out = out.withColumn(name, F.expr(expr))
    return (
        out.withColumn("distance_m", F.expr(final))
        .orderBy(F.col("distance_m").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("distance_m", 2).alias("distance_m"))
    )


def oracle_geo3d_nearest_sql(
    lat: float,
    lon: float,
    k: int = 10,
    planet: PlanetModel = WGS84,
    points_sql: str = "SELECT doc_id, lat, lon FROM pts",
) -> str:
    """DuckDB mirror of :func:`geo3d_nearest`: the SAME emitted steps,
    folded as nested subqueries (`points_sql` supplies doc_id/lat/lon)."""
    steps, final = _vincenty_steps("lat", "lon", float(lat), float(lon), planet)
    q = f"({points_sql})"
    for name, expr in steps:
        q = f"(SELECT *, {expr} AS {name} FROM {q})"
    # order on the UNROUNDED distance like the Spark plan, then round
    return f"""
SELECT doc_id, round(_vd, 2) AS distance_m
FROM (SELECT doc_id, {final} AS _vd FROM {q})
ORDER BY _vd ASC, doc_id ASC LIMIT {k}
"""
