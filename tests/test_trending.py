"""Trending terms: batch == streaming counts, per-window top-N rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_spark.streaming.windows import top_terms_per_window, trending_terms


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(240):
        # hour bucket h = i // 60; make "w<h>" dominate its hour
        h = i // 60
        rows.append((i, 1704067200 + i * 60, f"w{h} w{h} common extra{i % 5}"))
    return spark.createDataFrame(rows, ["doc_id", "epoch", "text"]).withColumn(
        "ts", F.timestamp_seconds(F.col("epoch"))
    ).cache()


def test_trending_counts_doc_level(docs):
    counts = {
        (r["win_start"], r["term"]): r["cnt"]
        for r in trending_terms(docs, "ts", "text", "1 hour").collect()
    }
    # per-doc DISTINCT terms: "w0 w0" counts once per doc
    some_win = min(w for w, _ in counts)
    assert counts[(some_win, "w0")] == 60
    assert counts[(some_win, "common")] == 60


def test_top_terms_per_window_rank(docs):
    ranked = top_terms_per_window(
        trending_terms(docs, "ts", "text", "1 hour"), top_n=2
    ).collect()
    by_win = {}
    for r in ranked:
        by_win.setdefault(r["win_start"], []).append((r["term"], r["cnt"]))
    assert len(by_win) == 4
    for win, terms in by_win.items():
        assert len(terms) == 2
        # cnt desc then term asc: 'common' (60) and the hour's w<h> (60)
        # tie at 60 → alphabetical: 'common' < 'w<h>'
        assert terms[0][0] == "common"
        assert terms[1][0].startswith("w")


def test_trending_streaming_equals_batch(spark, docs, tmp_path):
    src = str(tmp_path / "in")
    docs.select("doc_id", "ts", "text").write.parquet(src)
    batch = {
        (r["win_start"], r["term"]): r["cnt"]
        for r in trending_terms(spark.read.parquet(src), "ts", "text", "1 hour").collect()
    }
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = []

    q = (
        trending_terms(stream, "ts", "text", "1 hour", watermark="30 minutes")
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, epoch: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_res = {(r["win_start"], r["term"]): r["cnt"] for r in out}
    assert stream_res == batch
