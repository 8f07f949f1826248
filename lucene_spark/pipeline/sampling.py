"""Deterministic sampling and sequence packing for training-data prep.

Beyond the reference's operator set (SURVEY §2 pipeline ops): the
data-mixing stage of an LLM corpus pipeline needs reproducible
sampling — the same (corpus, seed) must select the same rows on any
cluster layout, any partitioning, any engine — and token-budget
sharding ("sequence packing") to cut the corpus into ~equal-token
chunks for training shards.

- :func:`hash_sample` / :func:`stratified_sample` — sampling by a
  cryptographic hash of the key, not an RNG: ``md5(seed || key)``'s
  leading 8 hex digits interpreted as an integer modulo 1e6 gives a
  uniform [0, 1e6) bucket; keep rows under ``fraction * 1e6``.
  Partition-independent, resume-idempotent, and exactly reproducible
  in any engine with md5 (the DuckDB oracle runs the same expression
  verbatim). `df.sample()` can't give any of that: its Bernoulli draw
  depends on partition layout and Spark's RNG stream.
- :func:`pack_sequences` — assign each doc a shard id so shards hold
  ~`target_tokens` tokens in a deterministic document order: a global
  running token total computed scale-correctly (range repartition on
  the order key, per-partition cumsum, driver-side cumsum of the
  per-partition totals — one tiny action; never a single-task global
  window), then ``shard = floor(tokens_before / target)``. This is
  the greedy in-order packing training pipelines use (true bin
  packing is NP-hard and order-destroying); a doc longer than the
  target gets its own shard.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "hash_sample",
    "stratified_sample",
    "pack_sequences",
    "temperature_mixing_weights",
]

_BUCKETS = 1_000_000


def _bucket(key_col, seed: int):
    """md5-derived uniform bucket in [0, 1e6): identical SQL exists in
    any engine — conv(substr(md5(seed||key), 1, 8), 16, 10) % 1e6."""
    h = F.md5(F.concat(F.lit(str(seed) + ":"), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep ~`fraction` of rows, deterministically by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(F.col(key_col), seed) < int(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    fractions: Dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (data mixing): keep rows of
    stratum s with probability fractions[s] (strata absent from the
    map use `default_fraction`)."""
    cut = F.lit(int(default_fraction * _BUCKETS))
    for s, f in sorted(fractions.items()):
        cut = F.when(F.col(strata_col) == s, F.lit(int(f * _BUCKETS))).otherwise(cut)
    return df.filter(_bucket(F.col(key_col), seed) < cut)


def pack_sequences(
    df: DataFrame,
    target_tokens: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Add ``shard`` (long) so consecutive docs (by `order_col`) land
    in the same shard until ~`target_tokens` accumulate.

    shard = floor(tokens_before / target) where tokens_before is the
    running total of `token_col` over docs strictly before this one in
    `order_col` order — greedy in-order packing.
    """
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n_part, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    totals = {
        r["_pid"]: r["tok"]
        for r in parts.groupBy("_pid")
        .agg(F.sum(F.col(token_col)).alias("tok"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    off = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        parts.withColumn("_before", F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0)))
        .join(off, "_pid")
        .withColumn(
            "shard",
            F.floor((F.col("_off") + F.col("_before")) / F.lit(int(target_tokens))).cast(
                "long"
            ),
        )
        .drop("_pid", "_off", "_before")
    )


def temperature_mixing_weights(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.7,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-based domain mixing (Conneau & Lample 2019 §3.1,
    the multilingual-LM exponential smoothing): sampling probability
    p_i ∝ n_i^alpha over per-domain counts — alpha < 1 up-weights
    low-resource domains. With ``budget``, also emits the expected
    document draw per domain for one epoch of that size.

    One partial-agg'd groupBy for the counts (domain cardinality
    bounds state), then pure arithmetic against the one-row total —
    corpus never reshuffles. Returns
    (domain, n_docs, weight[, expected]), domain asc."""
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    powered = counts.withColumn(
        "_w", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    )
    total = powered.agg(F.sum("_w").alias("_tw"))
    out = powered.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_docs",
        F.round(F.col("_w") / F.col("_tw"), 6).alias("weight"),
    )
    if budget is not None:
        out = out.withColumn(
            "expected", F.round(F.col("weight") * F.lit(float(budget)), 4)
        )
    return out.orderBy("domain")
