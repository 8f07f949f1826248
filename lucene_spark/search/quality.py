"""Search-quality evaluation: the benchmark/quality module analog
(`benchmark/quality/QualityStats.java:28`, `Judge.java`,
`QualityBenchmark.java:37`).

The reference scores a run (ranked doc list per quality query) against
a judge: precision at cut-offs, MRR with the top-5 window quirk
(QualityStats.java:88 sets the reciprocal rank only when the FIRST
relevant hit lands within the top 5), and average precision as the
mean of precision at each recall point divided by the query's total
relevant count (QualityStats.java:131 getAvp). nDCG is added as the
standard graded extension (log2 discount).

Spark shape: one row_number window per query over the run, a
broadcastable join against the judgments, and a single partial-agg'd
groupBy per query — metrics for millions of queries cost one shuffle
on query_id. All expressions are JVM-side (no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quality_stats", "mean_quality"]


def quality_stats(
    run: DataFrame,
    judgments: DataFrame,
    k: int = 20,
    mrr_window: int = 5,
    score_col: str = "score",
    grade_col: str = "grade",
) -> DataFrame:
    """Per-query metrics: p_at_k, recall_at_k, ap, mrr, ndcg_at_k.

    ``run``: (query_id, doc_id, score) — ranked by score desc, doc_id
    asc tie-break. ``judgments``: (query_id, doc_id, grade); grade > 0
    means relevant. The MRR honours the reference's window: 0 unless
    the first relevant hit ranks within ``mrr_window``
    (QualityStats.java:88)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col("doc_id").asc()
    )
    ranked = run.withColumn("rank", F.row_number().over(w))

    j = judgments.select(
        "query_id", "doc_id", F.col(grade_col).alias("grade")
    )
    # total relevant + ideal DCG per query (judgment-side aggregates)
    jw = Window.partitionBy("query_id").orderBy(
        F.col("grade").desc(), F.col("doc_id").asc()
    )
    totals = (
        j.filter(F.col("grade") > 0)
        .withColumn("jrank", F.row_number().over(jw))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("max_good"),
            F.sum(
                F.when(
                    F.col("jrank") <= k,
                    F.col("grade") / F.log2(F.col("jrank") + 1),
                ).otherwise(F.lit(0.0))
            ).alias("idcg"),
        )
    )

    hits = ranked.join(j, ["query_id", "doc_id"], "left").withColumn(
        "rel", (F.coalesce(F.col("grade"), F.lit(0)) > 0).cast("int")
    )
    # precision at each recall point: rel * (cumulative rel / rank)
    cw = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hits = hits.withColumn("cum_rel", F.sum("rel").over(cw))

    per_q = hits.groupBy("query_id").agg(
        (
            F.sum(F.when(F.col("rank") <= k, F.col("rel")).otherwise(0))
            / F.lit(float(k))
        ).alias("p_at_k"),
        F.sum(
            F.when(F.col("rank") <= k, F.col("rel")).otherwise(0)
        ).alias("_rel_at_k"),
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.col("cum_rel").cast("double") / F.col("rank"),
            ).otherwise(F.lit(0.0))
        ).alias("_sum_prec"),
        F.min(
            F.when(F.col("rel") == 1, F.col("rank"))
        ).alias("_first_rel"),
        F.sum(
            F.when(
                (F.col("rank") <= k)
                & (F.coalesce(F.col("grade"), F.lit(0)) > 0),
                F.coalesce(F.col("grade"), F.lit(0))
                / F.log2(F.col("rank") + 1),
            ).otherwise(F.lit(0.0))
        ).alias("_dcg"),
    )

    out = (
        per_q.join(totals, "query_id", "left")
        .select(
            "query_id",
            F.round("p_at_k", 6).alias("p_at_k"),
            F.round(
                F.col("_rel_at_k")
                / F.greatest(F.col("max_good"), F.lit(1)),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.col("_sum_prec")
                / F.greatest(F.col("max_good"), F.lit(1)),
                6,
            ).alias("ap"),
            F.round(
                F.when(
                    F.col("_first_rel") <= mrr_window,
                    1.0 / F.col("_first_rel"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("mrr"),
            F.round(
                F.when(
                    F.col("idcg") > 0, F.col("_dcg") / F.col("idcg")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg_at_k"),
        )
    )
    return out


def mean_quality(per_query: DataFrame) -> DataFrame:
    """QualityStats.average (QualityStats.java:194): arithmetic means
    over the evaluated queries."""
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("p_at_k"), 6).alias("mean_p_at_k"),
        F.round(F.avg("recall_at_k"), 6).alias("mean_recall"),
        F.round(F.avg("ap"), 6).alias("map"),
        F.round(F.avg("mrr"), 6).alias("mean_mrr"),
        F.round(F.avg("ndcg_at_k"), 6).alias("mean_ndcg"),
    )
