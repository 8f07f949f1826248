"""Commit points: generations, deletion policy, snapshots, rollback.

Reference semantics: SegmentInfos generations + IndexDeletionPolicy
(KeepOnlyLastCommitDeletionPolicy default), SnapshotDeletionPolicy
pinning, DirectoryReader.listCommits / open(IndexCommit) point-in-time
readers, IndexWriter rollback to an older commit.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import IndexCommits, InvertedIndex, delete_by_ids
from lucene_spark.search import IndexSearcher, TermQuery


@pytest.fixture()
def tdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def _topk(idx, term, k=10):
    return [
        (r["doc_id"], round(r["score"], 4))
        for r in IndexSearcher(idx).search(TermQuery(term), k).collect()
    ]


def test_commit_open_and_point_in_time(spark, documents, tdir):
    commits = IndexCommits(spark, tdir, keep_last=4)
    half = documents.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]

    old_docs = documents.filter(F.col("doc_id") < half)
    idx0 = InvertedIndex.build(old_docs, docs_per_segment=128)
    g0 = commits.commit(idx0, user_data={"source": "half"})
    idx1 = InvertedIndex.build(documents, docs_per_segment=128)
    g1 = commits.commit(idx1, user_data={"source": "full"})
    assert (g0, g1) == (0, 1)
    assert commits.current_generation() == 1
    assert [c["generation"] for c in commits.list_commits()] == [0, 1]
    assert commits.list_commits()[0]["user_data"] == {"source": "half"}

    # current open == full build; point-in-time open == the old view,
    # bit-identical to a fresh build over the filtered corpus
    assert _topk(commits.open(), "spark") == _topk(idx1, "spark")
    fresh_old = InvertedIndex.build(old_docs, docs_per_segment=128)
    assert _topk(commits.open(generation=0), "spark") == _topk(fresh_old, "spark")
    assert commits.open(generation=0).doc_count == idx0.doc_count

    with pytest.raises(KeyError):
        commits.open(generation=7)


def test_deletion_policy_keep_last(spark, documents, tdir):
    commits = IndexCommits(spark, tdir, keep_last=2)
    for i in range(4):
        idx = InvertedIndex.build(
            documents.filter(F.col("doc_id") % 4 <= i), docs_per_segment=128
        )
        commits.commit(idx)
    gens = [c["generation"] for c in commits.list_commits()]
    assert gens == [2, 3]  # KeepOnlyLast(2)
    assert not os.path.exists(os.path.join(tdir, "gen_000000"))
    assert os.path.exists(os.path.join(tdir, "gen_000003"))
    with pytest.raises(KeyError):
        commits.open(generation=0)


def test_snapshot_protects_commit(spark, documents, tdir):
    commits = IndexCommits(spark, tdir, keep_last=1)
    idx0 = InvertedIndex.build(
        documents.filter(F.col("doc_id") % 2 == 0), docs_per_segment=128
    )
    g0 = commits.commit(idx0)
    commits.snapshot(g0)
    for _ in range(2):
        commits.commit(InvertedIndex.build(documents, docs_per_segment=128))
    gens = [c["generation"] for c in commits.list_commits()]
    assert g0 in gens  # pinned survives keep_last=1
    assert 1 not in gens  # unpinned middle commit reaped
    # release + next commit reaps it
    commits.release(g0)
    commits.commit(InvertedIndex.build(documents, docs_per_segment=128))
    assert g0 not in [c["generation"] for c in commits.list_commits()]


def test_rollback(spark, documents, tdir):
    commits = IndexCommits(spark, tdir, keep_last=4)
    idx_full = InvertedIndex.build(documents, docs_per_segment=128)
    g0 = commits.commit(idx_full)
    top_before = _topk(commits.open(), "spark")

    # commit a version with the top doc deleted, then roll it back
    victim = top_before[0][0]
    idx_del = delete_by_ids(idx_full, [victim])
    g1 = commits.commit(idx_del)
    assert _topk(commits.open(), "spark")[0][0] != victim
    commits.rollback(g0)
    assert commits.current_generation() == g0
    assert _topk(commits.open(), "spark") == top_before
    assert not os.path.exists(os.path.join(tdir, "gen_000001"))
    with pytest.raises(KeyError):
        commits.open(generation=g1)


def test_commit_preserves_deletes(spark, documents, tdir):
    """A committed tombstone set survives the open round-trip."""
    commits = IndexCommits(spark, tdir)
    idx = InvertedIndex.build(documents, docs_per_segment=128)
    victim = _topk(idx, "spark")[0][0]
    commits.commit(delete_by_ids(idx, [victim]))
    reopened = commits.open()
    assert reopened.num_deleted == 1
    assert victim not in [d for d, _ in _topk(reopened, "spark")]
