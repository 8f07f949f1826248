"""Index sorting: distributed rank correctness, build-over-sorted
equivalence, and the early-termination query shape.
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.index.sorting import sort_docs
from lucene_spark.search import IndexSearcher, TermQuery


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"w{i % 7} common t{i % 3}", (i * 37) % 101) for i in range(500)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "rank_sig"]).cache()


def test_rank_assignment_matches_local_sort(corpus):
    got = sort_docs(
        corpus, [F.col("rank_sig").desc(), F.col("orig_doc_id").asc()],
        num_partitions=8,
    )
    rows = got.select("doc_id", "orig_doc_id", "rank_sig").collect()
    # contiguous 0..n-1
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == list(range(500))
    # doc_id order == (rank_sig desc, orig asc) order
    by_new = sorted(rows, key=lambda r: r["doc_id"])
    expect = sorted(rows, key=lambda r: (-r["rank_sig"], r["orig_doc_id"]))
    assert [r["orig_doc_id"] for r in by_new] == [r["orig_doc_id"] for r in expect]


def test_sorted_build_search_equivalence(corpus):
    """Same match sets before/after sorting (via the old→new map)."""
    plain = InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=128)
    srt = sort_docs(
        corpus, [F.col("rank_sig").desc(), F.col("orig_doc_id").asc()],
        num_partitions=8,
    ).persist()
    sorted_idx = InvertedIndex.build(srt, analyzer="simple", docs_per_segment=128)

    q = TermQuery("w3")
    a = {r["doc_id"] for r in IndexSearcher(plain).search(q, k=500).collect()}
    mapping = {r["doc_id"]: r["orig_doc_id"] for r in srt.select("doc_id", "orig_doc_id").collect()}
    b = {
        mapping[r["doc_id"]]
        for r in IndexSearcher(sorted_idx).search(q, k=500).collect()
    }
    assert a == b and a


def test_early_termination_topk(corpus):
    """Top-k by the sort field over a filtered match set is ORDER BY
    doc_id LIMIT k on the sorted index — no field sort at query time —
    and equals the brute-force field sort."""
    srt = sort_docs(
        corpus, [F.col("rank_sig").desc(), F.col("orig_doc_id").asc()],
        num_partitions=8,
    ).persist()
    idx = InvertedIndex.build(srt, analyzer="simple", docs_per_segment=128)
    matches = IndexSearcher(idx).search(TermQuery("w1"), k=500)
    top = (
        matches.select("doc_id")
        .orderBy("doc_id")
        .limit(5)
        .join(srt.select("doc_id", "orig_doc_id", "rank_sig"), "doc_id")
        .orderBy("doc_id")
        .collect()
    )
    brute = (
        corpus.filter(F.col("text").contains("w1 "))
        .orderBy(F.col("rank_sig").desc(), F.col("doc_id").asc())
        .limit(5)
        .collect()
    )
    assert [r["orig_doc_id"] for r in top] == [r["doc_id"] for r in brute]
    # plan check: the top-k is a TakeOrderedAndProject on doc_id, not a
    # global Sort on the field
    plan = matches.select("doc_id").orderBy("doc_id").limit(5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
