"""geo3d (spatial3d) analog: ellipsoid-exact Vincenty surface distance
over PlanetModel (geom/PlanetModel.java:469), XYZ encoding, planet
model selection, degenerate cases (identical points, equatorial line
NaN guard)."""

import math

import pytest

from lucene_spark.search.geo3d import (
    CLARKE_1866,
    SPHERE,
    WGS84,
    geo3d_nearest,
    geo3d_xyz,
)

PTS = [
    (0, 48.8566, 2.3522),     # Paris
    (1, -33.8688, 151.2093),  # Sydney
    (2, 40.7128, -74.0060),   # NYC
    (3, 0.0, 0.0),            # equator
    (4, 0.0, 90.0),           # equatorial line pair with 3
]


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(PTS, "doc_id long, lat double, lon double")


def _dist(df, lat, lon, planet):
    rows = geo3d_nearest(df, lat, lon, k=10, planet=planet).collect()
    return {r["doc_id"]: r["distance_m"] for r in rows}


def test_zero_distance_and_order(pts):
    d = _dist(pts, 48.8566, 2.3522, WGS84)
    assert d[0] == 0.0
    assert d[2] < d[1]  # NYC closer to Paris than Sydney


def test_wgs84_known_geodesics(pts):
    d = _dist(pts, 48.8566, 2.3522, WGS84)
    # Paris->NYC WGS84 geodesic ~5853 km (spherical is ~5836 km — the
    # ~0.3% gap IS the ellipsoid correction), Paris->Sydney ~16958 km
    assert d[2] == pytest.approx(5_853_000, rel=0.002)
    assert d[1] == pytest.approx(16_958_000, rel=0.002)


def test_sphere_reduces_to_great_circle(pts):
    # f=0: Vincenty collapses to the central angle x radius
    d = _dist(pts, 0.0, 0.0, SPHERE)
    assert d[4] == pytest.approx(math.pi / 2 * SPHERE.a, rel=1e-9)


def test_equatorial_line_nan_guard(pts):
    # cosSqAlpha == 0 along the equator (PlanetModel.java:497-499)
    d = _dist(pts, 0.0, 45.0, WGS84)
    assert 0 < d[3] < d[1]
    assert d[3] == pytest.approx(d[4], rel=1e-9)  # symmetric +-45 deg


def test_planet_models_differ(pts):
    dw = _dist(pts, 48.8566, 2.3522, WGS84)
    dc = _dist(pts, 48.8566, 2.3522, CLARKE_1866)
    ds = _dist(pts, 48.8566, 2.3522, SPHERE)
    # ellipsoids agree to ~100 ppm; sphere differs by up to ~0.5%
    assert dc[2] == pytest.approx(dw[2], rel=2e-4)
    assert dc[2] != dw[2]
    assert abs(ds[2] - dw[2]) / dw[2] < 0.006


def test_xyz_on_ellipsoid(pts):
    rows = geo3d_xyz(pts, planet=WGS84).collect()
    for r in rows:
        lhs = (r["x"] ** 2 + r["y"] ** 2) / WGS84.a**2 + r["z"] ** 2 / WGS84.b**2
        assert lhs == pytest.approx(1.0, rel=1e-12)
