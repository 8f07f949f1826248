"""NRT replicator: sync copies a commit, is idempotent/resumable,
switches atomically across generations, point-in-time readers hold,
old generations reaped per keep policy.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.index.commits import IndexCommits, _gen_dirname
from lucene_spark.index.replicator import PrimaryNode, ReplicaNode


@pytest.fixture()
def corpus(spark):
    rows = [(i, f"tok{i % 5} tok{i % 3} common") for i in range(60)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def primary(spark, corpus, tmp_path):
    commits = IndexCommits(spark, str(tmp_path / "primary"), keep_last=3)
    idx = InvertedIndex.build(corpus, docs_per_segment=32)
    commits.commit(idx, user_data={"v": "0"})
    return PrimaryNode(commits)


def test_sync_then_search_equal(spark, corpus, primary, tmp_path):
    replica = ReplicaNode(str(tmp_path / "replica"))
    stats = replica.sync(primary)
    assert stats["generation"] == 0 and stats["files_copied"] > 0
    ridx = replica.open(spark)
    want = {
        (r["term"], r["doc_freq"])
        for r in InvertedIndex.load(
            spark, os.path.join(primary.commits.root, _gen_dirname(0))
        ).terms.collect()
    }
    got = {(r["term"], r["doc_freq"]) for r in ridx.terms.collect()}
    assert got == want


def test_sync_idempotent_and_resumable(spark, primary, tmp_path):
    replica = ReplicaNode(str(tmp_path / "replica"))
    first = replica.sync(primary)
    second = replica.sync(primary)
    assert second["files_copied"] == 0
    assert second["files_skipped"] == first["files_copied"] + first["files_skipped"]
    # corrupt one replica file → only that file is re-copied
    gen_dir = os.path.join(replica.root, _gen_dirname(0))
    victim = next(
        os.path.join(dp, n)
        for dp, _, ns in os.walk(gen_dir)
        for n in ns
        if n.endswith(".parquet")
    )
    with open(victim, "wb") as f:
        f.write(b"corrupt")
    third = replica.sync(primary)
    assert third["files_copied"] == 1


def test_generation_switch_and_reap(spark, corpus, primary, tmp_path):
    replica = ReplicaNode(str(tmp_path / "replica"), keep_last=1)
    replica.sync(primary)
    # primary advances: index the corpus doubled
    bigger = corpus.union(
        corpus.select((F.col("doc_id") + 60).alias("doc_id"), "text")
    )
    idx2 = InvertedIndex.build(bigger, docs_per_segment=32)
    primary.commits.commit(idx2, user_data={"v": "1"})
    stats = replica.sync(primary)
    assert stats["generation"] == 1
    assert replica.current_generation() == 1
    assert replica.open(spark).doc_count == 120
    # keep_last=1 → gen 0 reaped after the switch
    assert not os.path.exists(os.path.join(replica.root, _gen_dirname(0)))


def test_open_requires_sync(tmp_path, spark):
    replica = ReplicaNode(str(tmp_path / "empty"))
    with pytest.raises(ValueError):
        replica.open(spark)
