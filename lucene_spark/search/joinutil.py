"""Query-time join with score propagation (JoinUtil ScoreModes).

`lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java:60`
`createJoinQuery(fromField, toField, fromQuery, searcher, scoreMode)`:
run a query on the "from" side, collect each join value with the
scores of the from-docs carrying it (TermsWithScoreCollector), then
match "to" docs whose field holds a collected value, scored by
`ScoreMode` (`join/ScoreMode.java`): None (constant), Max, Total, Min,
Avg.

Spark shape: the from side is a filtered scan + one partial-aggregated
groupBy on the join value; the per-value score table is small (bounded
by the from query's hit diversity) and is BROADCAST into the to-side
scan, so the big side never shuffles — the same reason the reference
collects from-terms into an in-memory map before the to-side pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["join_value_scores", "join_query"]

_MODES = {
    "none": lambda c: F.max(F.lit(1.0)),  # constant score, value presence only
    "max": F.max,
    "total": F.sum,
    "min": F.min,
    "avg": F.avg,
}


def join_value_scores(
    from_df: DataFrame, from_field: str, score_col: str, score_mode: str = "max"
) -> DataFrame:
    """(join_value, join_score) — one row per distinct from-side join
    value, scores folded per `ScoreMode` (TermsWithScoreCollector)."""
    if score_mode not in _MODES:
        raise ValueError(f"unknown score mode {score_mode!r}")
    agg = _MODES[score_mode]
    return from_df.groupBy(F.col(from_field).alias("join_value")).agg(
        agg(F.col(score_col).cast("double")).alias("join_score")
    )


def join_query(
    from_df: DataFrame,
    from_field: str,
    score_col: str,
    to_df: DataFrame,
    to_field: str,
    score_mode: str = "max",
) -> DataFrame:
    """To-side docs whose `to_field` matches a from-side join value,
    carrying the mode-folded score (JoinUtil.createJoinQuery)."""
    vals = join_value_scores(from_df, from_field, score_col, score_mode)
    return to_df.join(
        F.broadcast(vals), to_df[to_field] == vals["join_value"]
    ).drop("join_value")
