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

__all__ = ["windowed_event_counts"]


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
