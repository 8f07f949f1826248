"""Event-time windowed aggregation: batch == streaming, late-data drop."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lucene_spark.streaming.windows import windowed_event_counts


@pytest.fixture(scope="module")
def events(spark):
    from tests.conftest import SF_DIR

    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_batch_windowed_counts_match_manual(spark, events):
    got = {
        (r["event_type"], r["win_start"]): (r["cnt"], r["sum_value"])
        for r in windowed_event_counts(events, "1 hour").collect()
    }
    manual = {
        (r["event_type"], r["h"]): (r["cnt"], r["sv"])
        for r in events.groupBy(
            "event_type",
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / 3600).cast("long") * 3600
            ).alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sv"))
        .collect()
    }
    assert got == manual


def test_streaming_equals_batch(spark, events, tmp_path):
    src = str(tmp_path / "in")
    events.limit(2000).write.parquet(src)
    batch_res = {
        (r["event_type"], r["win_start"]): r["cnt"]
        for r in windowed_event_counts(
            spark.read.parquet(src), "30 minutes"
        ).collect()
    }
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = []

    def handle(df, epoch):
        out.extend(df.collect())

    q = (
        windowed_event_counts(stream, "30 minutes", watermark="10 minutes")
        .writeStream.outputMode("update")
        .foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_res = {(r["event_type"], r["win_start"]): r["cnt"] for r in out}
    assert stream_res == batch_res


def test_sliding_windows_overlap(spark, events):
    rows = windowed_event_counts(events.limit(500), "1 hour", "30 minutes").collect()
    # each event lands in exactly 2 sliding windows
    assert sum(r["cnt"] for r in rows) == 2 * 500
