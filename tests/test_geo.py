"""Geo queries (LatLonPoint analog): differential vs a pure-Python
haversine oracle, dateline box semantics, geohash test vectors.

Reference semantics:
`lucene/core/src/java/org/apache/lucene/document/LatLonPoint.java:60-103`
(newBoxQuery / newDistanceQuery / nearest).
"""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.geo import (
    EARTH_MEAN_RADIUS_METERS,
    box_query,
    distance_query,
    geohash_cell,
    haversine_meters,
    nearest_k,
)


def _py_haversine(lat1, lon1, lat2, lon2):
    rlat1, rlat2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = math.sin(dlat / 2) ** 2 + math.cos(rlat1) * math.cos(rlat2) * math.sin(dlon / 2) ** 2
    return 2.0 * EARTH_MEAN_RADIUS_METERS * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def points(spark):
    # deterministic pseudo-random points covering the full globe
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (((F.col("id") * 7919) % 18000) / 100.0 - 90.0).alias("lat"),
        (((F.col("id") * 104729) % 36000) / 100.0 - 180.0).alias("lon"),
    )
    return df.cache()


def _local(points):
    return [(r["doc_id"], r["lat"], r["lon"]) for r in points.collect()]


def test_haversine_matches_python(spark):
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], ["lat1", "lon1", "lat2", "lon2"]
    ).select(
        haversine_meters(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    )
    got = df.collect()[0]["d"]
    want = _py_haversine(48.8566, 2.3522, 51.5074, -0.1278)
    assert got == pytest.approx(want, rel=1e-12)
    # Paris-London great-circle distance is ~343.5 km (public fact)
    assert 342_000 < got < 345_000


def test_box_query_differential(points):
    rows = {r["doc_id"] for r in box_query(points, 10.0, 45.0, -30.0, 60.0).collect()}
    want = {
        d for d, lat, lon in _local(points) if 10.0 <= lat <= 45.0 and -30.0 <= lon <= 60.0
    }
    assert rows == want and rows


def test_box_query_dateline_crossing(points):
    # min_lon > max_lon: [170, 180] U [-180, -170]
    rows = {r["doc_id"] for r in box_query(points, -60.0, 60.0, 170.0, -170.0).collect()}
    want = {
        d
        for d, lat, lon in _local(points)
        if -60.0 <= lat <= 60.0 and (lon >= 170.0 or lon <= -170.0)
    }
    assert rows == want and rows


def test_distance_query_differential(points):
    lat, lon, radius = 48.8566, 2.3522, 2_000_000.0
    rows = {r["doc_id"] for r in distance_query(points, lat, lon, radius).collect()}
    want = {
        d for d, plat, plon in _local(points) if _py_haversine(plat, plon, lat, lon) <= radius
    }
    assert rows == want and rows


def test_distance_query_near_pole(points):
    # circle around 89N wraps all longitudes — box phase must not clip it
    lat, lon, radius = 89.0, 0.0, 500_000.0
    rows = {r["doc_id"] for r in distance_query(points, lat, lon, radius).collect()}
    want = {
        d for d, plat, plon in _local(points) if _py_haversine(plat, plon, lat, lon) <= radius
    }
    assert rows == want


def test_nearest_k_matches_brute_force(points):
    lat, lon = -33.8688, 151.2093
    got = [(r["doc_id"], r["distance_m"]) for r in nearest_k(points, lat, lon, k=10).collect()]
    brute = sorted(
        (_py_haversine(plat, plon, lat, lon), d) for d, plat, plon in _local(points)
    )[:10]
    assert [doc for doc, _ in got] == [doc for _, doc in brute]
    for (_, gd), (bd, _) in zip(got, brute):
        assert gd == pytest.approx(round(bd, 3), abs=1e-3)
    # ascending distance
    dists = [gd for _, gd in got]
    assert dists == sorted(dists)


def test_geohash_known_vectors(spark):
    # public geohash test vectors (geohash.org encoding)
    cases = [
        (57.64911, 10.40744, "u4pruyd"),
        (48.8566, 2.3522, "u09tvw0"),
        (-33.8688, 151.2093, "r3gx2f7"),
        (0.0, 0.0, "s000000"),
    ]
    df = spark.createDataFrame(cases, ["lat", "lon", "want"]).select(
        geohash_cell(F.col("lat"), F.col("lon"), precision=7).alias("got"), "want"
    )
    for r in df.collect():
        assert r["got"] == r["want"]


def test_geohash_prefix_property(spark):
    # lower precision is a strict prefix of higher precision (the property
    # that makes geohash a prefix-prunable partition key)
    df = spark.createDataFrame([(57.64911, 10.40744)], ["lat", "lon"]).select(
        geohash_cell(F.col("lat"), F.col("lon"), precision=4).alias("g4"),
        geohash_cell(F.col("lat"), F.col("lon"), precision=8).alias("g8"),
    )
    r = df.collect()[0]
    assert r["g8"].startswith(r["g4"])


def test_nearby_points_share_geohash_cell(spark):
    # two points ~150 m apart share a precision-6 cell neighborhood;
    # far-apart points never share precision-5
    df = spark.createDataFrame(
        [(48.8566, 2.3522), (48.8579, 2.3522), (-33.8688, 151.2093)],
        ["lat", "lon"],
    ).select(geohash_cell(F.col("lat"), F.col("lon"), precision=5).alias("g"))
    g = [r["g"] for r in df.collect()]
    assert g[0] == g[1]
    assert g[0] != g[2]


def test_polygon_query_square(spark):
    from lucene_spark.search.geo import polygon_query

    # unit square (10,10)-(20,20); includes strictly-inside points,
    # excludes outside and the classic concave cases
    square = [(10.0, 10.0), (20.0, 10.0), (20.0, 20.0), (10.0, 20.0)]
    pts = [
        (0, 15.0, 15.0, True),
        (1, 10.5, 19.5, True),
        (2, 25.0, 15.0, False),
        (3, 15.0, 25.0, False),
        (4, -15.0, -15.0, False),
    ]
    df = spark.createDataFrame(
        [(i, la, lo) for i, la, lo, _ in pts], ["doc_id", "lat", "lon"]
    )
    got = {r["doc_id"] for r in polygon_query(df, square).collect()}
    assert got == {i for i, _, _, want in pts if want}


def test_polygon_query_concave(spark):
    from lucene_spark.search.geo import polygon_query

    # concave "C" shape: the notch (right-middle) is OUTSIDE
    poly = [
        (0.0, 0.0),
        (10.0, 0.0),
        (10.0, 10.0),
        (6.0, 10.0),
        (6.0, 4.0),
        (4.0, 4.0),
        (4.0, 10.0),
        (0.0, 10.0),
    ]
    pts = [
        (0, 5.0, 2.0, True),   # inside the spine
        (1, 5.0, 7.0, False),  # inside the notch -> outside polygon
        (2, 8.0, 7.0, True),   # upper arm
        (3, 2.0, 7.0, True),   # lower arm
        (4, 11.0, 5.0, False),
    ]
    df = spark.createDataFrame(
        [(i, la, lo) for i, la, lo, _ in pts], ["doc_id", "lat", "lon"]
    )
    got = {r["doc_id"] for r in polygon_query(df, poly).collect()}
    assert got == {i for i, _, _, want in pts if want}


def test_polygon_sql_matches_engine(spark):
    import duckdb

    from lucene_spark.search.geo import polygon_contains_sql, polygon_query

    rng_pts = [
        (i, ((i * 7919) % 18000) / 100.0 - 90.0, ((i * 104729) % 36000) / 100.0 - 180.0)
        for i in range(2000)
    ]
    poly = [(35.005, -10.005), (60.005, -5.005), (55.005, 30.005),
            (40.005, 25.005), (30.005, 10.005)]
    df = spark.createDataFrame(rng_pts, ["doc_id", "lat", "lon"])
    got = sorted(r["doc_id"] for r in polygon_query(df, poly).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(doc_id BIGINT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", rng_pts)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM pts WHERE {polygon_contains_sql(poly)} ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want and len(got) > 0
