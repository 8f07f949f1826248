"""Generation-numbered commit points over an index directory.

Lucene separates *writing* an index from *committing* it: every
``IndexWriter.commit()`` writes a new ``segments_N`` generation file,
and an ``IndexDeletionPolicy`` decides which older generations survive
(reference: ``lucene/core/src/java/org/apache/lucene/index/SegmentInfos.java``
generation handling, ``IndexDeletionPolicy.java``,
``KeepOnlyLastCommitDeletionPolicy.java``,
``SnapshotDeletionPolicy.java:60`` — snapshotted commits are protected
from deletion — and ``DirectoryReader.listCommits`` /
``DirectoryReader.open(IndexCommit)`` for point-in-time readers).

This module provides the same lifecycle over the parquet index layout
written by :meth:`InvertedIndex.save`:

- each commit is a self-contained ``gen_%06d`` directory (blocks /
  terms / norms parquet + the per-commit ``manifest.json``),
- ``commits.json`` is the ``segments.gen`` analog: a single small JSON
  file naming the current generation, the retained commit list, their
  ``user_data`` (``IndexWriter.setLiveCommitData``), and the snapshot
  set. It is replaced atomically (tmp + ``os.replace``) so a reader
  never observes a torn commit — exactly the two-phase shape Lucene
  gets from writing ``segments_N`` then updating the in-memory
  generation counter.

Scale note: everything here is O(#commits) driver-side metadata; the
data files are parquet directories written once per commit and never
rewritten, so a 100 TB index pays only the incremental ``save()`` cost
per commit. Point-in-time opens are plain ``spark.read.parquet`` of an
immutable directory — no coordination with concurrent writers needed,
which is the property Lucene's commit-point readers have on a real
deployment (readers pin a generation; the deletion policy refuses to
reap pinned generations).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, List, Optional

from pyspark.sql import SparkSession

from .builder import InvertedIndex

_COMMITS_FILE = "commits.json"


def _gen_dirname(gen: int) -> str:
    return f"gen_{gen:06d}"


class IndexCommits:
    """Commit-point manager for a directory of index generations.

    ``keep_last`` is the deletion policy: ``1`` is Lucene's default
    ``KeepOnlyLastCommitDeletionPolicy``; larger values retain a
    trailing window of commits. Snapshotted generations are always
    retained regardless of the policy
    (``SnapshotDeletionPolicy.java:60``).
    """

    def __init__(self, spark: SparkSession, root: str, keep_last: int = 1):
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        self.spark = spark
        self.root = root
        self.keep_last = keep_last
        os.makedirs(root, exist_ok=True)

    # -- segments.gen analog ------------------------------------------------
    def _state(self) -> dict:
        path = os.path.join(self.root, _COMMITS_FILE)
        if not os.path.exists(path):
            return {"current": None, "commits": [], "snapshots": []}
        with open(path) as f:
            return json.load(f)

    def _write_state(self, state: dict) -> None:
        tmp = os.path.join(self.root, "_commits.tmp")
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, os.path.join(self.root, _COMMITS_FILE))  # atomic

    # -- commit --------------------------------------------------------------
    def commit(
        self, index: InvertedIndex, user_data: Optional[Dict[str, str]] = None
    ) -> int:
        """Write a new generation and make it current; prune per policy.

        Returns the new generation number. Mirrors
        ``IndexWriter.commit()``: data files are fully written before
        the commits file flips, so a crash mid-commit leaves the
        previous generation current and at worst an orphan ``gen_*``
        directory (reaped by the next successful commit's prune pass).
        """
        state = self._state()
        gen = (state["current"] + 1) if state["current"] is not None else 0
        gen_dir = os.path.join(self.root, _gen_dirname(gen))
        index.save(gen_dir)
        state["commits"].append(
            {
                "generation": gen,
                "user_data": dict(user_data or {}),
                "committed_at": time.time(),
                "doc_count": index.doc_count,
                "num_deleted": index.num_deleted,
            }
        )
        state["current"] = gen
        self._prune(state)
        self._write_state(state)
        return gen

    def _prune(self, state: dict) -> None:
        """Drop commits outside the keep_last window unless snapshotted."""
        snaps = set(state["snapshots"])
        keep = {c["generation"] for c in state["commits"][-self.keep_last :]}
        if state["current"] is not None:
            keep.add(state["current"])
        retained = []
        for c in state["commits"]:
            g = c["generation"]
            if g in keep or g in snaps:
                retained.append(c)
            else:
                shutil.rmtree(
                    os.path.join(self.root, _gen_dirname(g)), ignore_errors=True
                )
        state["commits"] = retained

    # -- readers ---------------------------------------------------------------
    def list_commits(self) -> List[dict]:
        """Retained commit points, oldest first (DirectoryReader.listCommits)."""
        return list(self._state()["commits"])

    def current_generation(self) -> Optional[int]:
        return self._state()["current"]

    def open(self, generation: Optional[int] = None) -> InvertedIndex:
        """Open the index at a commit point (DirectoryReader.open(IndexCommit)).

        ``generation=None`` opens the current commit.
        """
        state = self._state()
        if state["current"] is None:
            raise FileNotFoundError(f"no commits under {self.root}")
        gen = state["current"] if generation is None else generation
        if gen not in {c["generation"] for c in state["commits"]}:
            raise KeyError(f"generation {gen} is not a retained commit")
        return InvertedIndex.load(
            self.spark, os.path.join(self.root, _gen_dirname(gen))
        )

    # -- snapshots (SnapshotDeletionPolicy) -----------------------------------
    def snapshot(self, generation: Optional[int] = None) -> int:
        """Pin a commit so pruning never reaps it; returns the generation."""
        state = self._state()
        gen = state["current"] if generation is None else generation
        if gen is None or gen not in {c["generation"] for c in state["commits"]}:
            raise KeyError(f"generation {generation} is not a retained commit")
        if gen not in state["snapshots"]:
            state["snapshots"].append(gen)
            self._write_state(state)
        return gen

    def release(self, generation: int) -> None:
        """Unpin a snapshot; it becomes reapable at the next commit's prune."""
        state = self._state()
        if generation in state["snapshots"]:
            state["snapshots"].remove(generation)
            self._write_state(state)

    # -- rollback ---------------------------------------------------------------
    def rollback(self, generation: int) -> None:
        """Make an older retained commit current again, discarding newer ones.

        The analog of opening an ``IndexWriter`` on an older
        ``IndexCommit`` (``IndexWriterConfig.setIndexCommit``,
        ``IndexWriter.java`` rollback semantics): generations after the
        target are deleted (snapshots included — Lucene likewise drops
        post-commit state on rollback) and the commits file flips to
        the target atomically.
        """
        state = self._state()
        gens = {c["generation"] for c in state["commits"]}
        if generation not in gens:
            raise KeyError(f"generation {generation} is not a retained commit")
        for c in state["commits"]:
            g = c["generation"]
            if g > generation:
                shutil.rmtree(
                    os.path.join(self.root, _gen_dirname(g)), ignore_errors=True
                )
        state["commits"] = [
            c for c in state["commits"] if c["generation"] <= generation
        ]
        state["snapshots"] = [g for g in state["snapshots"] if g <= generation]
        state["current"] = generation
        self._write_state(state)
