"""Event-time windowed aggregations with watermarks (Structured Streaming).

The reference has no stream semantics (SURVEY §2.7) — this is part of
the training-data-pipeline surface: event streams feeding index updates
or quality dashboards need event-time windows that tolerate late data.

- :func:`windowed_event_counts` — tumbling/sliding event-time window
  counts + value sums with a watermark bounding state: late events
  within the watermark still land in their window; older ones drop.
- Works identically on a batch DataFrame (window() is a plain
  expression) and on a ``readStream`` source — the same code path is
  used by the batch gate query (`events_hourly` is the batch analog).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

__all__ = ["windowed_event_counts", "trending_terms", "top_terms_per_window"]


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: Optional[str] = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (event_type, window) counts and value sums.

    On a streaming DataFrame the watermark bounds aggregation state and
    admits late events up to `watermark`; on a batch DataFrame the
    watermark is a no-op and the result is exact.
    """
    # watermarks require TIMESTAMP (not NTZ) event time
    src = events.withColumn("_ts", F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("_ts", watermark)
    win = F.window(F.col("_ts"), window_duration, slide_duration or window_duration)
    return (
        src.groupBy("event_type", win.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "cnt",
            "sum_value",
        )
    )


def trending_terms(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per event-time window, term document-counts — the stream-safe
    aggregation half of a "trending terms" dashboard.

    Emits (win_start timestamp, term, cnt). Works identically on batch
    and ``readStream`` inputs (watermark bounds state on streams); the
    per-window top-N rank is :func:`top_terms_per_window`, a separate
    batch / `foreachBatch` step, because a rank-within-window is not an
    incrementalizable streaming aggregation (Spark would reject it in
    append mode) — the counts stream is the state, the rank is a cheap
    per-trigger view over it.
    """
    src = docs.withColumn("_ts", F.col(ts_col).cast("timestamp"))
    if docs.isStreaming:
        src = src.withWatermark("_ts", watermark)
    win = F.window(F.col("_ts"), window_duration)
    return (
        src.select(
            win.alias("win"),
            F.explode(
                F.array_distinct(
                    F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
                )
            ).alias("term"),
        )
        .groupBy(F.col("win.start").alias("win_start"), "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_terms_per_window(term_counts: DataFrame, top_n: int = 3) -> DataFrame:
    """Top-`top_n` terms per window (cnt desc, term asc) from
    :func:`trending_terms` output — batch or `foreachBatch`."""
    from pyspark.sql import Window as W

    w = W.partitionBy("win_start").orderBy(F.col("cnt").desc(), F.col("term").asc())
    return (
        term_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .drop("rn")
    )
