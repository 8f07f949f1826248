"""Deletes/updates (liveDocs): tombstone filtering, Lucene stats
semantics (docFreq counts deletes until reclaim), merge-time reclaim
equivalence to a fresh build on the filtered corpus, update-by-term.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.index import (
    InvertedIndex,
    apply_deletes,
    delete_by_ids,
    delete_by_query,
    delete_documents,
    reclaimable_segments,
    update_document,
)
from lucene_spark.search import BooleanClause, BooleanQuery, IndexSearcher, Occur, TermQuery

WORDS = ["hash", "join", "scan", "sort", "merge", "spark", "query", "index"]


def _corpus(spark, n=60):
    rows = []
    for i in range(n):
        toks = [WORDS[(i + j) % len(WORDS)] for j in range(3 + i % 5)]
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def base(spark):
    docs = _corpus(spark)
    return docs, InvertedIndex.build(docs, analyzer="simple", docs_per_segment=16)


def _hits(idx, term, k=100):
    return {
        r["doc_id"]
        for r in IndexSearcher(idx).search(TermQuery(term), k=k).collect()
    }


def test_delete_documents_filters_search_but_not_stats(spark, base):
    docs, idx = base
    before = _hits(idx, "hash")
    join_docs = {
        r["doc_id"]
        for r in docs.filter(
            F.concat(F.lit(" "), "text", F.lit(" ")).like("% join %")
        ).collect()
    }
    d = delete_documents(idx, "join")
    # matching docs gone from results
    assert _hits(d, "join") == set()
    assert _hits(d, "hash") == before - join_docs
    # Lucene semantics: maxDoc/stats unchanged, numDocs reflects deletes
    assert d.doc_count == idx.doc_count
    assert d.sum_total_term_freq == idx.sum_total_term_freq
    assert d.num_deleted == len(join_docs)
    assert d.num_docs == idx.doc_count - len(join_docs)
    # surviving docs keep identical scores (stats not rewritten)
    s_before = {
        r["doc_id"]: r["score"]
        for r in IndexSearcher(idx).search(TermQuery("hash"), k=100).collect()
    }
    s_after = {
        r["doc_id"]: r["score"]
        for r in IndexSearcher(d).search(TermQuery("hash"), k=100).collect()
    }
    for doc, sc in s_after.items():
        assert sc == s_before[doc]


def test_wand_respects_deletes(spark, base):
    docs, idx = base
    d = delete_by_ids(idx, list(range(0, 30)))
    q = BooleanQuery.of(
        BooleanClause(TermQuery("hash"), Occur.SHOULD),
        BooleanClause(TermQuery("merge"), Occur.SHOULD),
    )
    wand = IndexSearcher(d).search(q, k=10, mode="wand").collect()
    exh = IndexSearcher(d).search(q, k=10, mode="exhaustive").collect()
    assert [(r["doc_id"], r["score"]) for r in wand] == [
        (r["doc_id"], r["score"]) for r in exh
    ]
    assert all(r["doc_id"] >= 30 for r in wand)


def test_delete_by_query_and_ids(spark, base):
    docs, idx = base
    q = BooleanQuery.of(
        BooleanClause(TermQuery("hash"), Occur.MUST),
        BooleanClause(TermQuery("join"), Occur.MUST),
    )
    d = delete_by_query(idx, q)
    both = docs.filter(
        F.concat(F.lit(" "), "text", F.lit(" ")).like("% hash %")
        & F.concat(F.lit(" "), "text", F.lit(" ")).like("% join %")
    ).count()
    assert d.num_deleted == both
    # deleting absent / already-deleted ids is a no-op on the count
    d2 = delete_by_ids(d, [10**9, 10**9 + 1])
    assert d2.num_deleted == both


def test_full_reclaim_equals_fresh_build(spark, base):
    docs, idx = base
    d = delete_documents(InvertedIndex.build(docs, analyzer="simple", docs_per_segment=16), "scan")
    rec = apply_deletes(d)
    survivors = docs.filter(
        ~F.concat(F.lit(" "), "text", F.lit(" ")).like("% scan %")
    )
    fresh = InvertedIndex.build(survivors, analyzer="simple", docs_per_segment=16)
    # stats now reflect the reclaim (docFreq drops only at merge time)
    assert rec.doc_count == fresh.doc_count
    assert rec.sum_total_term_freq == fresh.sum_total_term_freq
    assert rec.deletes is None and rec.num_deleted == 0
    t_rec = {
        r["term"]: (r["doc_freq"], r["total_term_freq"]) for r in rec.terms.collect()
    }
    t_fresh = {
        r["term"]: (r["doc_freq"], r["total_term_freq"]) for r in fresh.terms.collect()
    }
    assert t_rec == t_fresh
    n_rec = sorted((r["doc_id"], r["dl"], r["norm"]) for r in rec.norms.collect())
    n_fresh = sorted((r["doc_id"], r["dl"], r["norm"]) for r in fresh.norms.collect())
    assert n_rec == n_fresh
    for term in ("hash", "join", "sort"):
        a = IndexSearcher(rec).search(TermQuery(term), k=20).collect()
        b = IndexSearcher(fresh).search(TermQuery(term), k=20).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]


def test_partial_reclaim_keeps_other_tombstones(spark, base):
    docs, idx = base
    d = delete_by_ids(
        InvertedIndex.build(docs, analyzer="simple", docs_per_segment=16),
        [0, 1, 2, 20, 21, 40],
    )
    segs = reclaimable_segments(d, min_delete_ratio=0.15)
    assert segs == [0]  # 3/16 deleted in segment 0; fewer elsewhere
    rec = apply_deletes(d, segments=[0])
    # segment 0's deletes are gone for good; others remain tombstoned
    assert rec.num_deleted == 3
    remaining = {r["doc_id"] for r in rec.deletes.collect()}
    assert remaining == {20, 21, 40}
    # stats dropped ONLY by segment 0's reclaimed docs
    assert rec.doc_count == d.doc_count - 3
    # and search still excludes the unreclaimed tombstones
    hits = _hits(rec, "hash", k=100)
    assert not hits & {0, 1, 2, 20, 21, 40}


def test_update_document(spark, base):
    docs, idx = base
    # replace every doc containing 'spark' with one fresh doc
    repl = spark.createDataFrame(
        [(1000, "spark reborn fresh")], "doc_id long, text string"
    )
    d = update_document(
        InvertedIndex.build(docs, analyzer="simple", docs_per_segment=16),
        "spark",
        repl,
    )
    hits = _hits(d, "spark", k=200)
    assert hits == {1000}
    assert _hits(d, "reborn") == {1000}


def test_positional_reclaim_phrase(spark):
    docs = spark.createDataFrame(
        [
            (0, "hash join wins"),
            (1, "no match here"),
            (2, "hash join again"),
            (3, "hash but no join phrase"),
        ],
        "doc_id long, text string",
    )
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=2, positions=True)
    from lucene_spark.search.positional import phrase_freqs

    d = delete_by_ids(idx, [0])
    rec = apply_deletes(d)
    rows = phrase_freqs(rec, ["hash", "join"]).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_save_load_roundtrip_deletes(spark, base, tmp_path):
    docs, idx = base
    d = delete_by_ids(idx, [5, 6, 7])
    path = str(tmp_path / "idx")
    d.save(path)
    loaded = InvertedIndex.load(spark, path)
    assert loaded.num_deleted == 3
    assert {r["doc_id"] for r in loaded.deletes.collect()} == {5, 6, 7}
    assert not _hits(loaded, "hash", k=200) & {5, 6, 7}
