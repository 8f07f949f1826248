"""WARC source connector: record parsing, gzip members, HTTP envelope
stripping, byte-identical round trips, and the Spark binaryFile →
mapInPandas path."""

import pytest

from lucene_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    warc_bytes,
)

RECS = [
    ("http://example.com/a", "2026-01-01T00:00:00Z", "<p>page A</p>".encode()),
    ("http://example.com/b", "2026-01-02T00:00:00Z",
     "<html>ünïcode &amp; bytes</html>".encode()),
    ("http://example.com/c", "2026-01-03T00:00:00Z", b""),
]


def test_roundtrip_plain():
    parsed = list(parse_warc_records(warc_bytes(RECS)))
    assert len(parsed) == 3
    for (url, ts, html), (rtype, purl, pts, status, ctype, payload) in zip(
        RECS, parsed
    ):
        assert rtype == "response"
        assert (purl, pts) == (url, ts)
        assert status == 200
        assert ctype == "text/html"
        assert payload == html  # byte-identical


def test_roundtrip_gzip_members():
    data = warc_bytes(RECS, gzip_members=True)
    assert data[:2] == b"\x1f\x8b"
    parsed = list(parse_warc_records(data))
    assert [p[5] for p in parsed] == [h for _, _, h in RECS]


def test_non_response_records_parsed():
    raw = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 9\r\n\r\n"
        b"software\n\r\n\r\n"
    ) + warc_bytes(RECS[:1])
    parsed = list(parse_warc_records(raw))
    assert parsed[0][0] == "warcinfo"
    assert parsed[0][5] == b"software\n"
    assert parsed[1][0] == "response"


def test_truncated_input_stops_cleanly():
    data = warc_bytes(RECS)[:40]
    assert list(parse_warc_records(data)) == []


def test_read_warc_spark(spark, tmp_path):
    p = tmp_path / "archives"
    p.mkdir()
    (p / "part-0.warc").write_bytes(warc_bytes(RECS[:2]))
    (p / "part-1.warc.gz").write_bytes(warc_bytes(RECS[2:], gzip_members=True))
    df = read_warc(spark, str(p))
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {u for u, _, _ in RECS}
    for url, ts, html in RECS:
        assert bytes(rows[url].html) == html
        assert rows[url].warc_ts == ts
        assert rows[url].http_status == 200
    # plan shape: binaryFile scan + one Arrow eval, no shuffle
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_warc_stream_to_index(spark, tmp_path):
    """End-to-end Common-Crawl-drop shape: WARC archives arrive →
    streaming record split → HTML strip → deterministic doc_ids →
    index build in foreachBatch → BM25 term search."""
    from pyspark.sql import functions as F

    from lucene_spark.analysis.htmlstrip import extract_html_text
    from lucene_spark.index.builder import InvertedIndex
    from lucene_spark.sources.warc import read_warc_stream

    recs = [
        ("http://x.com/1", "2026-01-01T00:00:00Z",
         b"<p>spark indexes archives</p>"),
        ("http://x.com/2", "2026-01-02T00:00:00Z",
         b"<p>archives of the web</p>"),
    ]
    src = tmp_path / "drop"
    src.mkdir()
    (src / "crawl-0.warc").write_bytes(warc_bytes(recs))

    built = {}

    def handle(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        pages = extract_html_text(batch_df, binary=True, out_col="text")
        from pyspark.sql.window import Window

        corpus = (
            pages.withColumn(
                "doc_id",
                F.row_number().over(Window.orderBy("warc_ts", "url")) - 1,
            )
            .select("doc_id", F.trim("text").alias("text"), "url")
            # sever lineage from the micro-batch source: the index
            # outlives the batch (same pattern as streaming/incremental)
            .localCheckpoint()
        )
        # standard analyzer: web text isn't space-normalized (the
        # simple analyzer's single-space split is for oracle parity)
        built["idx"] = InvertedIndex.build(
            corpus, analyzer="standard", docs_per_segment=8
        )
        built["corpus"] = corpus.collect()

    q = (
        read_warc_stream(spark, str(src))
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert "idx" in built
    from lucene_spark.search.query import TermQuery
    from lucene_spark.search.searcher import IndexSearcher

    hits = IndexSearcher(built["idx"]).search(
        TermQuery("archives"), k=5
    ).collect()
    assert len(hits) == 2  # both pages match
    # extracted text is the stripped page body
    texts = {r.url: r.text.strip() for r in built["corpus"]}
    assert texts["http://x.com/1"] == "spark indexes archives"


def test_parser_never_raises_on_garbage():
    """Robustness: arbitrary bytes (truncated records, bad lengths,
    non-UTF8 headers, fake gzip magic) parse to a (possibly empty)
    record list, never an exception."""
    import random

    rnd = random.Random(42)
    samples = [
        b"",
        b"\x1f\x8b",                       # gzip magic, truncated
        b"\x1f\x8b\x08\x00garbage",
        b"WARC/1.0\r\n",                    # headers never terminated
        b"WARC/1.0\r\nContent-Length: zzz\r\n\r\nbody",
        b"WARC/1.0\r\nContent-Length: 999999\r\n\r\nshort",
        b"not a warc at all",
        bytes(rnd.randrange(256) for _ in range(512)),
        warc_bytes(RECS)[:-7],              # truncated tail
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4\r\n\r\n"
        b"\xff\xfe\x00\x01\r\n\r\n",       # binary payload
    ]
    for s in samples:
        recs = list(parse_warc_records(s))
        assert isinstance(recs, list)
