"""Field collapsing: best hit per group key inside one top-k.

Lucene's grouping module (`grouping/src/java/org/apache/lucene/search/
grouping/FirstPassGroupingCollector.java`) keeps, per group value, the
single best-scoring document and returns the top groups — the "one
result per site/domain" search shape.

Spark re-expression: score the match set (same float64 parity scorer
the other gates use), join the group key, take `row_number() == 1`
per group over (score desc, doc_id asc), then a global top-k. The
rank window runs over (doc_id, group, s) METADATA only — the window
shuffles k-independent narrow rows partitioned by group, and the
group key cardinality bounds state exactly like the collector's
per-group slot array.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search.parity import _bm25_scored_f64

__all__ = ["collapse_topk"]


def collapse_topk(
    index: InvertedIndex,
    term_boosts: Dict[str, float],
    groups: DataFrame,
    group_col: str,
    k: int = 10,
) -> DataFrame:
    """(group, doc_id, score): the best hit per `group_col` value for a
    BM25 disjunction, top-`k` groups by that best score (score desc,
    doc_id asc; 4-dp rounded display score)."""
    scored = _bm25_scored_f64(index, term_boosts)
    keyed = scored.join(
        groups.select("doc_id", F.col(group_col).alias("group")), "doc_id"
    )
    w = Window.partitionBy("group").orderBy(F.col("s").desc(), F.col("doc_id").asc())
    best = keyed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("group", "doc_id", F.round("s", 4).alias("score"))
    )
