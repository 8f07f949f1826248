"""DistanceFeatureQuery: rank by proximity to an origin value.

Re-expression of the reference's distance-feature family:

- ``LongPoint.newDistanceFeatureQuery`` →
  `core/src/java/org/apache/lucene/document/LongDistanceFeatureQuery.java:121`
  scores ``boost * pivot / (pivot + |value - origin|)`` over a numeric
  doc-values field (recency boosting is the canonical use).
- ``LatLonPoint.newDistanceFeatureQuery`` →
  `LatLonPointDistanceFeatureQuery.java:130` scores
  ``boost * pivot / (pivot + haversin_meters(origin, point))``.
- Both are typically added as a SHOULD clause next to a text query so
  the proximity score ADDS to the relevance score
  (`document/LatLonPoint.java:371` javadoc shape) —
  :func:`distance_boosted_topk` is that composition.

Scale shape: the score expression is a pure codegen Column and top-k
is `TakeOrderedAndProject`, so the default path is one scan, no
shuffle. The reference additionally *skips* far docs once the top-k
heap is full by intersecting the point tree with a shrinking
``[origin - d, origin + d]`` interval
(`LongDistanceFeatureQuery.java:270-295` ``computeMaxDistance``). The
Spark analog is the ``adaptive`` path: probe an expanding interval
(sargable ``BETWEEN`` → parquet min/max pruning prunes row groups)
until it holds ≥ k candidates, then top-k only within it. Correct
because the score is strictly decreasing in distance — no doc outside
a radius can outrank k docs inside it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.search.geo import haversine_meters

__all__ = [
    "long_distance_feature_score",
    "geo_distance_feature_score",
    "long_distance_feature_topk",
    "geo_distance_feature_topk",
    "distance_boosted_topk",
]


def long_distance_feature_score(
    value: Column, origin: float, pivot: float, boost: float = 1.0
) -> Column:
    """``boost * pivot / (pivot + |value - origin|)``
    (`LongDistanceFeatureQuery.java:121`), float64 end-to-end so the
    DuckDB oracle hash-matches."""
    if pivot <= 0:
        raise ValueError("pivotDistance must be > 0")
    dist = F.abs(value.cast("double") - F.lit(float(origin)))
    return F.lit(float(boost)) * F.lit(float(pivot)) / (F.lit(float(pivot)) + dist)


def geo_distance_feature_score(
    lat: Column,
    lon: Column,
    origin_lat: float,
    origin_lon: float,
    pivot_m: float,
    boost: float = 1.0,
) -> Column:
    """``boost * pivot / (pivot + haversin_meters(origin, pt))``
    (`LatLonPointDistanceFeatureQuery.java:130`)."""
    if pivot_m <= 0:
        raise ValueError("pivotDistance must be > 0")
    d = haversine_meters(lat, lon, F.lit(float(origin_lat)), F.lit(float(origin_lon)))
    return F.lit(float(boost)) * F.lit(float(pivot_m)) / (F.lit(float(pivot_m)) + d)


def long_distance_feature_topk(
    df: DataFrame,
    id_col: str,
    value_col: str,
    origin: float,
    pivot: float,
    boost: float = 1.0,
    k: int = 10,
    adaptive: bool = False,
) -> DataFrame:
    """Top-k (id, score) by long distance-feature score, desc / id asc.
    Docs with a NULL value don't match (NumericDocValues absent →
    the iterator never advances to them).

    ``adaptive=True`` mirrors the reference's point-tree skipper:
    expand ``[origin - d, origin + d]`` (starting at ``pivot``,
    doubling) until ≥ k rows survive the *pushdown-pruned* scan, then
    rank only those. Each probe is a count over a sargable range —
    at 100 TB the parquet min/max zone maps skip every far row group,
    so the common case reads a tiny slice instead of the full column.
    """
    base = df.filter(F.col(value_col).isNotNull())
    if adaptive:
        total_needed = k
        d = float(pivot)
        lo_hi = lambda r: (float(origin) - r, float(origin) + r)  # noqa: E731
        for _ in range(40):  # 2^40 × pivot covers any long range
            lo, hi = lo_hi(d)
            cand = base.filter(F.col(value_col).between(lo, hi))
            # bounded count probe (metadata/pruned scan, not a collect
            # of rows): stop expanding once enough candidates exist
            if cand.limit(total_needed).count() >= total_needed:
                base = cand
                break
            d *= 2.0
    s = long_distance_feature_score(F.col(value_col), origin, pivot, boost)
    return (
        base.select(F.col(id_col), s.alias("_s"))
        .orderBy(F.col("_s").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("_s", 6).alias("score"))
    )


def geo_distance_feature_topk(
    points: DataFrame,
    origin_lat: float,
    origin_lon: float,
    pivot_m: float,
    boost: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k (id, score) by geo distance-feature score, desc / id asc,
    over a (id, lat, lon) frame."""
    s = geo_distance_feature_score(
        F.col("lat"), F.col("lon"), origin_lat, origin_lon, pivot_m, boost
    )
    return (
        points.filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .select(F.col(id_col), s.alias("_s"))
        .orderBy(F.col("_s").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("_s", 6).alias("score"))
    )


def distance_boosted_topk(
    scored: DataFrame,
    feature: DataFrame,
    value_col: str,
    origin: float,
    pivot: float,
    boost: float = 1.0,
    k: int = 10,
) -> DataFrame:
    """BooleanQuery(text SHOULD, distanceFeature SHOULD): the union of
    both match sets, scored as the SUM of the clauses that match —
    exactly Lucene's disjunction semantics when a distance-feature
    clause rides next to a text query (the recommended recency-boost
    shape, `document/LongPoint.java` newDistanceFeatureQuery javadoc).

    ``scored`` is a float64 (doc_id, s) frame from the parity scorer;
    ``feature`` is (doc_id, value_col). One full-outer equi-join on
    doc_id — co-located when both sides share the corpus
    partitioning."""
    fs = feature.filter(F.col(value_col).isNotNull()).select(
        "doc_id",
        long_distance_feature_score(F.col(value_col), origin, pivot, boost).alias(
            "_fs"
        ),
    )
    joined = scored.select("doc_id", "s").join(fs, "doc_id", "full_outer")
    total = F.coalesce(F.col("s"), F.lit(0.0)) + F.coalesce(F.col("_fs"), F.lit(0.0))
    return (
        joined.select("doc_id", total.alias("_t"))
        .orderBy(F.col("_t").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.round("_t", 4).alias("score"))
    )
