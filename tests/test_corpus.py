"""Corpus generator: determinism, schema, invariants (FIXTURES.md F1)."""

from pyspark.sql import functions as F

from lucene_spark.analysis import extract_text_col
from lucene_spark.corpus import synthetic_corpus
from lucene_spark.index import assign_doc_ids


def test_schema_and_determinism(spark):
    a = synthetic_corpus(spark, 300, seed=42, num_partitions=3)
    b = synthetic_corpus(spark, 300, seed=42, num_partitions=7)
    assert a.schema == b.schema
    assert set(a.columns) == {"url", "warc_ts", "html", "text", "lang"}
    ra = {r["url"]: (r["text"], r["lang"], r["warc_ts"]) for r in a.collect()}
    rb = {r["url"]: (r["text"], r["lang"], r["warc_ts"]) for r in b.collect()}
    assert ra == rb  # partition-count independent
    assert len(ra) == 300  # urls unique


def test_html_wraps_text_byte_identically(spark):
    df = synthetic_corpus(spark, 100, seed=1, num_partitions=2)
    bad = df.filter(extract_text_col(F.col("html")) != F.col("text")).count()
    assert bad == 0


def test_length_spread_and_skew(spark):
    df = synthetic_corpus(spark, 2000, seed=42, num_partitions=4).select(
        F.size(F.split("text", " ")).alias("n"), "text"
    )
    stats = df.agg(
        F.min("n").alias("lo"), F.max("n").alias("hi"), F.avg("n").alias("mean")
    ).collect()[0]
    assert stats["hi"] > 500  # long docs exercise quantized norm buckets
    assert stats["lo"] >= 0
    # zipf head: stopword 'the' should be among the most frequent terms
    top = (
        df.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .count()
        .orderBy(F.col("count").desc())
        .limit(10)
        .collect()
    )
    from lucene_spark.analysis import ENGLISH_STOP_WORDS

    assert any(r["t"] in ENGLISH_STOP_WORDS for r in top)


def test_doc_id_assignment_on_corpus(spark):
    df = synthetic_corpus(spark, 500, seed=42, num_partitions=4)
    with_ids = assign_doc_ids(df, ["warc_ts", "url"], num_buckets=16)
    ids = [r["doc_id"] for r in with_ids.select("doc_id").collect()]
    assert sorted(ids) == list(range(500))
