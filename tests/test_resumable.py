"""Resumable bulk build: crash, resume, equivalence with single-shot."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.index.resumable import load_resumable, resumable_build
from lucene_spark.search import IndexSearcher, TermQuery


@pytest.fixture()
def tdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def _topk(idx, term, k=10):
    return [
        (r["doc_id"], r["score"])
        for r in IndexSearcher(idx).search(TermQuery(term), k).collect()
    ]


def test_resumable_crash_and_resume(spark, documents, tdir):
    n = documents.count()
    batch = 128

    # simulate a crash after 2 batches via the on_batch hook
    class Crash(Exception):
        pass

    done = []

    def crash_after_2(b, lineage):
        done.append(b)
        if len(done) == 2:
            raise Crash()

    with pytest.raises(Crash):
        resumable_build(
            documents, tdir, total_docs=n, batch_docs=batch,
            docs_per_segment=64, on_batch=crash_after_2,
        )

    m = json.load(open(os.path.join(tdir, "manifest.json")))
    completed_before = {k for k, v in m["batches"].items() if v.get("complete")}
    assert len(completed_before) == 2

    # resume: only the remaining batches build
    rebuilt = []
    resumable_build(
        documents, tdir, total_docs=n, batch_docs=batch,
        docs_per_segment=64, on_batch=lambda b, l: rebuilt.append(b),
    )
    assert set(rebuilt).isdisjoint({int(b) for b in completed_before})

    m2 = json.load(open(os.path.join(tdir, "manifest.json")))
    assert all(v["complete"] for v in m2["batches"].values())
    # lineage rows carry doc ranges + metrics
    for v in m2["batches"].values():
        assert v["doc_hi"] > v["doc_lo"]
        assert v["payload_bytes"] > 0

    # equivalence with a single-shot build
    resumed = load_resumable(spark, tdir)
    oneshot = InvertedIndex.build(documents, analyzer="simple", docs_per_segment=64)
    assert resumed.doc_count == oneshot.doc_count
    assert resumed.sum_total_term_freq == oneshot.sum_total_term_freq
    for term in ("spark", "hash", "join"):
        assert _topk(resumed, term) == _topk(oneshot, term), term


def test_resumable_rejects_misaligned_batch(spark, documents, tdir):
    with pytest.raises(ValueError):
        resumable_build(documents, tdir, total_docs=100, batch_docs=100, docs_per_segment=64)
