"""Index build: stats, norms, posting-block round-trip, docID assignment."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.functions.forutil import fordelta_decode, pfor_decode
from lucene_spark.functions.smallfloat import int_to_byte4
from lucene_spark.index import InvertedIndex, assign_doc_ids

TEXTS = [
    "the fast fox",
    "fast fast fox jumps",
    "",
    "fox and the hound and the fox",
    "slow snail",
    "fast snail jumps high over the fox",
]


@pytest.fixture(scope="module")
def idx(spark):
    pdf = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    df = spark.createDataFrame(pdf)
    return InvertedIndex.build(df, analyzer="simple", docs_per_segment=4)


def test_collection_stats(idx):
    # docs with no tokens contribute no norm entry (Lucene: field absent)
    assert idx.doc_count == 5
    total_tokens = sum(len(t.split()) for t in TEXTS if t)
    assert idx.sum_total_term_freq == total_tokens


def test_term_stats(idx):
    stats = {r["term"]: (r["doc_freq"], r["total_term_freq"]) for r in idx.terms.collect()}
    assert stats["fox"] == (4, 5)
    assert stats["fast"] == (3, 4)
    assert stats["the"] == (3, 4)
    assert stats["snail"] == (2, 2)


def test_norms(idx):
    norms = {r["doc_id"]: (r["dl"], r["norm"]) for r in idx.norms.collect()}
    for doc_id, text in enumerate(TEXTS):
        if not text:
            assert doc_id not in norms
            continue
        dl = len(text.split())
        assert norms[doc_id] == (dl, int(int_to_byte4(dl)))


def test_blocks_round_trip(idx):
    rows = idx.blocks.filter(F.col("term") == "fox").collect()
    got = {}
    for r in rows:
        docs = fordelta_decode(bytes(r["docs_packed"]))
        freqs = pfor_decode(bytes(r["freqs_packed"]))
        norms = np.frombuffer(bytes(r["norms_raw"]), dtype=np.uint8)
        assert r["num_docs"] == len(docs) == len(freqs) == len(norms)
        assert r["first_doc"] == docs[0] and r["max_doc"] == docs[-1]
        assert list(docs) == sorted(docs)
        for d, f in zip(docs, freqs):
            got[int(d)] = int(f)
    assert got == {0: 1, 1: 1, 3: 2, 5: 1}


def test_segment_split(idx):
    # docs_per_segment=4 → docs 0-3 in segment 0, 4-5 in segment 1;
    # 'fox' appears in both → its posting list is split across segments
    segs = {r["segment_id"] for r in idx.blocks.filter(F.col("term") == "fox").collect()}
    assert segs == {0, 1}


def test_impacts_pareto(idx):
    r = idx.blocks.filter((F.col("term") == "fox") & (F.col("segment_id") == 0)).collect()[0]
    pairs = list(zip(r["impact_freqs"], r["impact_norms"]))
    # frontier: freq strictly increasing with norm increasing
    assert all(f2 > f1 for (f1, _), (f2, _) in zip(pairs, pairs[1:]))
    assert all(n2 > n1 for (_, n1), (_, n2) in zip(pairs, pairs[1:]))
    assert r["max_freq"] == max(r["impact_freqs"])


def test_save_load_round_trip(idx, spark, tmp_path):
    d = str(tmp_path / "idx")
    idx.save(d)
    loaded = InvertedIndex.load(spark, d)
    assert loaded.doc_count == idx.doc_count
    assert loaded.sum_total_term_freq == idx.sum_total_term_freq
    assert loaded.blocks.count() == idx.blocks.count()
    assert {r["term"] for r in loaded.terms.collect()} == {
        r["term"] for r in idx.terms.collect()
    }


def test_assign_doc_ids_deterministic(spark):
    pdf = pd.DataFrame(
        {
            "url": [f"https://h{i % 3}.example/p/{i}" for i in range(100)],
            "ts": np.arange(100)[::-1] * 1000,  # descending to force reorder
        }
    )
    df = spark.createDataFrame(pdf)
    a = assign_doc_ids(df, ["ts", "url"], num_buckets=7)
    b = assign_doc_ids(df.repartition(13), ["ts", "url"], num_buckets=7)
    ra = {r["url"]: r["doc_id"] for r in a.collect()}
    rb = {r["url"]: r["doc_id"] for r in b.collect()}
    assert ra == rb  # independent of partition layout
    assert sorted(ra.values()) == list(range(100))  # dense 0..n-1
    # rank order matches (ts, url) sort order
    order = sorted(ra, key=lambda u: (pdf.set_index("url")["ts"][u], u))
    assert [ra[u] for u in order] == list(range(100))


def test_large_block_chunking(spark):
    # one term in 300 docs → blocks of 128/128/44
    pdf = pd.DataFrame({"doc_id": range(300), "text": ["common"] * 300})
    idx2 = InvertedIndex.build(spark.createDataFrame(pdf), analyzer="simple", docs_per_segment=1000)
    rows = sorted(
        idx2.blocks.filter(F.col("term") == "common").collect(),
        key=lambda r: r["block_ord"],
    )
    assert [r["num_docs"] for r in rows] == [128, 128, 44]
    assert rows[0]["first_doc"] == 0 and rows[-1]["max_doc"] == 299


def test_check_index_clean(spark, documents):
    """CheckIndex analog: a freshly built index has zero violations."""
    from lucene_spark.index import InvertedIndex
    from lucene_spark.index.check import check_index

    idx = InvertedIndex.build(documents, analyzer="simple", docs_per_segment=128, positions=True)
    report = check_index(idx)
    assert all(v == 0 for v in report.values()), report


def test_check_index_after_merge(spark, documents):
    from lucene_spark.index import InvertedIndex
    from lucene_spark.index.check import check_index
    from lucene_spark.index.merge import force_merge

    idx = InvertedIndex.build(documents, analyzer="simple", docs_per_segment=64)
    merged = force_merge(idx)
    report = check_index(merged)
    # merged segments violate the original docs_per_segment bound by
    # design (they span absorbed ranges) — skip that one check
    report.pop("segment_bounds")
    assert all(v == 0 for v in report.values()), report


def test_check_index_detects_corruption(spark, documents):
    """Corrupt a block's metadata → the checker flags it."""
    from pyspark.sql import functions as F

    from lucene_spark.index import InvertedIndex
    from lucene_spark.index.check import check_index

    idx = InvertedIndex.build(documents, analyzer="simple", docs_per_segment=128)
    idx.blocks = idx.blocks.withColumn(
        "max_freq",
        F.when(F.col("term") == "spark", F.lit(9999)).otherwise(F.col("max_freq")),
    )
    report = check_index(idx)
    assert report["impacts_cover"] > 0


def test_check_index_detects_zone_corruption(spark, documents):
    """A zeroed doc_zones bitmap (which would make conjunction pruning
    silently drop blocks) is flagged."""
    from pyspark.sql import functions as F

    from lucene_spark.index import InvertedIndex
    from lucene_spark.index.check import check_index

    idx = InvertedIndex.build(documents, analyzer="simple", docs_per_segment=128)
    idx.blocks = idx.blocks.withColumn(
        "doc_zones",
        F.when(F.col("term") == "spark", F.lit(0)).otherwise(F.col("doc_zones")),
    )
    report = check_index(idx)
    assert report["doc_zones"] > 0


def test_saved_index_full_query_battery(spark, documents, tmp_path):
    """Every query family must work identically on a reloaded index
    (parquet-backed blocks with predicate pushdown) as on the in-memory
    build."""
    from lucene_spark.index import InvertedIndex
    from lucene_spark.search import IndexSearcher, parse_query
    from lucene_spark.search.positional import phrase_topk, synonym_topk

    idx = InvertedIndex.build(
        documents, analyzer="simple", docs_per_segment=128, positions=True
    )
    d = str(tmp_path / "ix")
    idx.save(d)
    loaded = InvertedIndex.load(spark, d)

    s_mem, s_dsk = IndexSearcher(idx), IndexSearcher(loaded)
    for qs in [
        "spark",
        "hash AND join",
        '"hash join"',
        "quer~1 OR s*",
        "+merge -scan sort",
        "(hash OR sort) AND join^2",
    ]:
        q = parse_query(qs)
        a = [(r["doc_id"], r["score"]) for r in s_mem.search(q, 10, "exhaustive").collect()]
        b = [(r["doc_id"], r["score"]) for r in s_dsk.search(q, 10, "exhaustive").collect()]
        assert a == b, qs
    # positional + synonym APIs on the loaded index
    assert (
        phrase_topk(loaded, ["hash", "join"], k=5).collect()
        == phrase_topk(idx, ["hash", "join"], k=5).collect()
    )
    assert (
        synonym_topk(loaded, ["hash", "merge"], k=5).collect()
        == synonym_topk(idx, ["hash", "merge"], k=5).collect()
    )


def test_exorcise_drops_corrupt_segment(spark, documents):
    """CheckIndex -exorcise analog: the corrupt segment is dropped,
    stats recomputed, and the repaired index passes a fresh check."""
    from pyspark.sql import functions as F

    from lucene_spark.index import InvertedIndex
    from lucene_spark.index.check import check_index, exorcise

    idx = InvertedIndex.build(documents, analyzer="simple", docs_per_segment=128)
    n_segments = idx.num_segments
    total_docs = idx.doc_count
    # corrupt segment 0's metadata (max_freq no longer covered)
    idx.blocks = idx.blocks.withColumn(
        "max_freq",
        F.when(F.col("segment_id") == 0, F.lit(9999)).otherwise(F.col("max_freq")),
    )
    assert check_index(idx)["impacts_cover"] > 0

    clean, report = exorcise(idx)
    assert report["dropped_segments"] == [0]
    assert report["lost_docs"] == 128
    assert clean.num_segments == n_segments - 1
    assert clean.doc_count == total_docs - 128
    # repaired index is healthy and has no segment-0 docs
    rep = check_index(clean)
    assert all(v == 0 for v in rep.values())
    assert clean.blocks.filter(F.col("segment_id") == 0).count() == 0
    # stats consistent: sumTotalTermFreq equals surviving norms' Σ dl
    assert clean.sum_total_term_freq == (
        clean.norms.agg(F.sum("dl")).collect()[0][0]
    )


def test_exorcise_clean_index_is_noop(spark, documents):
    from lucene_spark.index import InvertedIndex
    from lucene_spark.index.check import exorcise

    idx = InvertedIndex.build(documents, analyzer="simple", docs_per_segment=128)
    same, report = exorcise(idx)
    assert report == {"dropped_segments": [], "lost_docs": 0}
    assert same is idx
