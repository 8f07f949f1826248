"""Block join with parent score modes.

Re-expression of `lucene/join/src/java/org/apache/lucene/search/join/`:

- ``ToParentBlockJoinQuery`` + ``ScoreMode``
  (`ToParentBlockJoinQuery.java:63`, `ScoreMode.java:20`: None / Avg /
  Max / Total / Min): a child query's hits roll up to their parents,
  the parent's score aggregated from its matching children per mode.
- ``ToChildBlockJoinQuery`` (`ToChildBlockJoinQuery.java:42`): a parent
  query's matches select their child rows (each child inherits the
  parent score).

Spark shape: the reference's doc-block adjacency (children stored
before their parent in one segment) exists so the join can run in one
sequential pass; the relational equivalent is an equi-join on the
parent key. The child aggregation is a partial-agg'd groupBy on the
key (map-side combine), and the parent side broadcasts when small —
the exact plan the gate `block_join_orders` asserts. At 100 TB,
bucketing both tables by the parent key makes the join co-located
(zero-shuffle), the same locality the block layout buys the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "SCORE_MODES",
    "to_parent_block_join",
    "to_child_block_join",
    "parent_children_block_join",
]

SCORE_MODES = ("none", "avg", "max", "total", "min")

_AGG = {
    "avg": F.avg,
    "max": F.max,
    "total": F.sum,
    "min": F.min,
}


def to_parent_block_join(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_score: Column,
    score_mode: str = "max",
) -> DataFrame:
    """Parents having >= 1 matching child (filter `children` first —
    that is the child query), scored per ``score_mode`` over
    ``child_score``; mode 'none' scores 0 like the reference. Returns
    the parent rows + ``score`` + ``n_children``."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    aggs = [F.count(F.lit(1)).alias("n_children")]
    if score_mode == "none":
        score = F.lit(0.0)
    else:
        aggs.append(_AGG[score_mode](child_score.cast("double")).alias("_cs"))
        score = F.col("_cs")
    rolled = children.groupBy(F.col(child_key).alias("_ck")).agg(*aggs)
    return (
        parents.join(rolled, parents[parent_key] == F.col("_ck"))
        .withColumn("score", score)
        .drop("_ck", "_cs")
    )


def to_child_block_join(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    parent_score: Column = None,
) -> DataFrame:
    """Child rows of matching parents (ToChildBlockJoinQuery): each
    child inherits its parent's score (`ToChildBlockJoinQuery.java:42`
    — "the child documents receive the parent's score"). The matched
    parent set broadcasts (it is the query's selective side)."""
    sel = [F.col(parent_key).alias("_pk")]
    if parent_score is not None:
        sel.append(parent_score.cast("double").alias("score"))
    p = parents.select(*sel)
    return children.join(F.broadcast(p), children[child_key] == F.col("_pk")).drop(
        "_pk"
    )


def parent_children_block_join(
    children: DataFrame,
    child_key: str,
    parent_id,
    child_score: Column = None,
) -> DataFrame:
    """ParentChildrenBlockJoinQuery
    (`join/ParentChildrenBlockJoinQuery.java:40`): the matching
    children of ONE given parent — the "expand this hit's children"
    UI query. The equality predicate on the (partition/bucket) parent
    key pushes into the scan, so at 100 TB this reads one bucket, not
    the corpus."""
    out = children.filter(F.col(child_key) == F.lit(parent_id))
    if child_score is not None:
        out = out.withColumn("score", child_score.cast("double"))
    return out
