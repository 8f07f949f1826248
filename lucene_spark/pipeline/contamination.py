"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set.

The standard training-pipeline hygiene step (the 13-gram collision
methodology published with GPT-3 appendix C / PaLM appendix): a
training document is contaminated if it shares any word n-gram with a
benchmark document. Built on the same distinct-shingle frame the
MinHash dedup path uses (`dedup.word_shingles`).

Scale shape: the eval side of the join is a benchmark — thousands of
documents against a 100 TB corpus — so its distinct shingle set is
BROADCAST and the training side never shuffles: one map-side hash
semi-join over the shingle explode, then a partial-aggregated groupBy
on doc_id. No all-pairs comparison, no corpus-wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_shingles

__all__ = ["ngram_contamination", "contaminated_ids"]


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per training doc: n-gram counts against the eval set.

    Returns (doc_id, n_grams, n_hit, frac double, contaminated int)
    for every training doc with at least one n-gram; ``contaminated``
    is 1 when the overlap fraction EXCEEDS ``threshold`` (0.0 = any
    collision flags, the published default).
    """
    train_sh = word_shingles(train, n=n, text_col=text_col, id_col=id_col)
    eval_sh = (
        word_shingles(eval_df, n=n, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    totals = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    frac = F.col("n_hit") * F.lit(1.0) / F.col("n_grams")
    return (
        totals.join(hits, "doc_id", "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)))
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            frac.alias("frac"),
            (frac > F.lit(threshold)).cast("int").alias("contaminated"),
        )
    )


def contaminated_ids(
    train: DataFrame, eval_df: DataFrame, n: int = 13, **kw
) -> DataFrame:
    """Just the ids to drop — the shape a cleaning job consumes."""
    rep = ngram_contamination(train, eval_df, n=n, **kw)
    return rep.filter(F.col("contaminated") == 1).select("doc_id")
