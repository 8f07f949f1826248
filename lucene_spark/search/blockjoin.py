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


def parent_sort_by_child(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_value: Column,
    selector: str = "min",
    ascending: bool = True,
    k: int | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """ToParentBlockJoinSortField (`join/ToParentBlockJoinSortField.java:48`
    + `BlockJoinSelector.java`): sort PARENT hits by a value selected
    from their (pre-filtered) CHILD documents — the reverse flag maps
    to ``BlockJoinSelector.Type.MAX`` vs ``MIN`` (:146), i.e. the
    lowest or highest child field value represents the block.

    Spark re-expression: one partial-agg'd groupBy over the child key
    (min/max combine map-side, so the shuffle carries one row per
    parent), then a join back to the parent hits and a
    TakeOrderedAndProject when ``k`` is given. Parents with no
    children sort last (the reference's missing-value treatment for
    absent child values). Returns the parent rows + ``sort_value``."""
    if selector not in ("min", "max"):
        raise ValueError("selector must be 'min' or 'max'")
    agg = (F.min if selector == "min" else F.max)(
        child_value.cast("double")
    ).alias("sort_value")
    per_parent = children.groupBy(F.col(child_key).alias("_ck")).agg(agg)
    joined = parents.join(
        per_parent, parents[parent_key] == F.col("_ck"), "left"
    ).drop("_ck")
    sv = F.col("sort_value")
    order = [sv.asc_nulls_last() if ascending else sv.desc_nulls_last()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    out = joined.orderBy(*order)
    return out.limit(k) if k is not None else out


def check_join_index(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
) -> dict:
    """CheckJoinIndex (`join/CheckJoinIndex.java:37`): validate the
    parent/child structure before running block joins. The reference
    walks each segment asserting every child doc lies under a parent
    bit and live-ness matches within a block; the key-join data model
    maps those invariants to:

    - every child's ``child_key`` resolves to exactly one parent
      (orphan children = the "child as last doc" / uncovered-doc
      corruption);
    - parent keys are unique (a duplicated parent key would make a
      child belong to two blocks).

    Both checks are one anti-join / one groupBy over keys only.
    Returns {'parents': n, 'children': n} on success, raises
    ``ValueError`` (the IllegalStateException analog) otherwise."""
    from pyspark.sql import functions as F

    dup = (
        parents.groupBy(F.col(parent_key))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"duplicate parent key {dup[0][0]!r}: a child would belong to "
            "two blocks"
        )
    orphan = (
        children.select(F.col(child_key).alias("_ck"))
        .join(
            parents.select(F.col(parent_key).alias("_pk")),
            F.col("_ck") == F.col("_pk"),
            "left_anti",
        )
        .limit(1)
        .collect()
    )
    if orphan:
        raise ValueError(
            f"orphan child key {orphan[0][0]!r}: every child must be "
            "covered by a parent block"
        )
    return {"parents": parents.count(), "children": children.count()}
