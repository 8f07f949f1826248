"""Streaming exact dedup: cross-batch state drops re-arrivals; stream
result ≡ batch dropDuplicates; stateful variant survives multiple
micro-batches with unbounded horizon."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lucene_spark.streaming.dedup_stream import dedup_stream, dedup_stream_stateful


def test_batch_mode_dedup(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["same", "same", "other", "same"],
                "ts": pd.to_datetime(["2026-01-01"] * 4),
            }
        )
    )
    out = dedup_stream(docs).collect()
    assert len(out) == 2
    assert {r["content_md5"] for r in out} == {
        r["content_md5"]
        for r in docs.select(F.md5("text").alias("content_md5")).distinct().collect()
    }


def _run_stream(spark, tmp_path, builder):
    inp = str(tmp_path / "in")
    os.makedirs(inp, exist_ok=True)
    ckpt = str(tmp_path / "ckpt")
    # two files → (at least) two micro-batches with maxFilesPerTrigger=1
    b1 = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["aa", "bb", "aa"]})
    b2 = pd.DataFrame({"doc_id": [10, 11, 12], "text": ["aa", "cc", "bb"]})
    # ONE file per batch: the file source processes files in
    # modification-time order, so arrival order (which decides
    # first-occurrence winners across batches) is deterministic
    spark.createDataFrame(b1).repartition(1).write.parquet(inp + "/b1")
    import time as _time

    _time.sleep(1.1)  # distinct mtimes
    spark.createDataFrame(b2).repartition(1).write.parquet(inp + "/b2")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(inp + "/*")
    )
    q = (
        builder(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("SELECT * FROM dedup_out").collect()


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    rows = _run_stream(spark, tmp_path, lambda s: dedup_stream_stateful(s))
    # 'aa' dup within batch 1 AND again in batch 2; 'bb' again in batch 2
    kept = sorted(r["doc_id"] for r in rows)
    assert kept == [0, 1, 11]
