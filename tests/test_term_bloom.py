"""BloomFilteringPostingsFormat analog: parquet bloom filters on the
blocks' term column (InvertedIndex.save(term_bloom=True)).

parquet-mr materializes a bloom filter only for column chunks that
overflow dictionary encoding; dict-encoded chunks already prune
exactly via dictionary filtering. So the small-index test asserts
behavioral identity + pushdown, and the high-cardinality test asserts
the physical filter appears once dictionaries overflow — the regime
the option exists for at scale."""

import glob
import os

from pyspark.sql import functions as F

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search import IndexSearcher, parse_query


def _dir_bytes(d):
    return sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(d, "*.parquet"))
    )


def test_bloom_materializes_past_dictionary(spark, tmp_path):
    # > 1 MB of distinct term bytes in one file → dictionary fallback
    # → the bloom filter is physically written
    df = spark.createDataFrame(
        [(f"term-{i:07d}-padding-to-make-it-long", i) for i in range(60000)],
        "term string, v long",
    ).coalesce(1)
    plain, bloom = str(tmp_path / "p"), str(tmp_path / "b")
    df.write.mode("overwrite").parquet(plain)
    w = df.write.mode("overwrite")
    for k, v in InvertedIndex._term_bloom_options(60000).items():
        w = w.option(k, v)
    w.parquet(bloom)
    assert _dir_bytes(bloom) > _dir_bytes(plain)


def test_bloom_save_identical_results(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"common word{i % 50} rare{i}") for i in range(400)],
        "doc_id long, text string",
    )
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=128)
    plain = str(tmp_path / "plain")
    bloom = str(tmp_path / "bloom")
    idx.save(plain)
    idx.save(bloom, term_bloom=True)

    a = IndexSearcher(InvertedIndex.load(spark, plain))
    b = IndexSearcher(InvertedIndex.load(spark, bloom))
    q = parse_query("rare7")
    ra = {(r.doc_id, round(r.score, 5)) for r in a.search(q, k=5).collect()}
    rb = {(r.doc_id, round(r.score, 5)) for r in b.search(q, k=5).collect()}
    assert ra == rb and len(ra) > 0

    # equality pushdown still reaches the scan (the bloom/dictionary
    # consult happens below this, inside parquet-mr)
    blocks = spark.read.parquet(os.path.join(bloom, "blocks"))
    plan = (
        blocks.filter(F.col("term") == "rare7")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "rare7" in plan
