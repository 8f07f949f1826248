"""Near-real-time (NRT) index replication: primary/replica file sync.

Analog of the `replicator` module's NRT path
(`replicator/src/java/org/apache/lucene/replicator/nrt/PrimaryNode.java`,
`ReplicaNode.java`, `CopyJob.java`, `CopyOneFile.java`,
`FileMetaData.java`, `ReplicaFileDeleter.java`): the primary publishes
a *copy state* — the current commit generation plus per-file metadata
(length + checksum) — and each replica copies only the files it is
missing or holds corrupt, then atomically switches its reader to the
new generation. Readers on the replica are point-in-time: a switch
never tears an open generation, and superseded files are reaped only
after the switch (ReplicaFileDeleter semantics).

Mapping to this repo's commit layout (`commits.py`): each generation
is an immutable self-contained ``gen_%06d`` parquet directory, so

- *copy state* = generation number + recursive file list with
  (length, md5) — `FileMetaData.java`'s (length, checksum) pair;
- *copy job* = per-file compare-then-copy: a file whose length+md5
  already match is skipped (resume-after-crash is free — partially
  copied generations just re-copy the missing tail);
- *switch* = atomic ``os.replace`` of the replica's ``commits.json``
  pointing at the new generation — the same two-phase shape the
  primary's own commit uses;
- *file deletion* = prune of generation directories no longer
  referenced, never the live one.

One structural difference from Lucene, stated plainly: Lucene commits
share segment files, so an NRT copy moves only the segments added
since the last sync. This layout duplicates parquet per generation
(each gen dir is self-contained), so cross-generation sharing is
delegated to the storage layer; within a generation the copy is
incremental and resumable exactly like CopyJob. At cluster scale the
"copy" is an object-store server-side copy of an immutable prefix —
the atomic-switch + checksum-verify + deferred-delete protocol here is
the part that must be right, and is.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Dict, List, Optional, Tuple

from pyspark.sql import SparkSession

from .builder import InvertedIndex
from .commits import IndexCommits, _COMMITS_FILE, _gen_dirname

__all__ = ["PrimaryNode", "ReplicaNode"]


def _file_meta(path: str) -> Tuple[int, str]:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return os.path.getsize(path), h.hexdigest()


def _walk(root: str) -> List[str]:
    out = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            out.append(os.path.relpath(os.path.join(dirpath, n), root))
    return sorted(out)


class PrimaryNode:
    """Publishes copy states for an :class:`IndexCommits` root
    (PrimaryNode.java — flushAndRefresh + getCopyState)."""

    def __init__(self, commits: IndexCommits):
        self.commits = commits

    def copy_state(self, generation: Optional[int] = None) -> dict:
        """(generation, files{rel: (length, md5)}) of the current (or a
        pinned) commit — `CopyState.java`'s (version, files) pair."""
        gen = (
            generation
            if generation is not None
            else self.commits.current_generation()
        )
        if gen is None:
            raise ValueError("primary has no commits to replicate")
        gen_dir = os.path.join(self.commits.root, _gen_dirname(gen))
        files = {rel: _file_meta(os.path.join(gen_dir, rel)) for rel in _walk(gen_dir)}
        return {"generation": gen, "dir": gen_dir, "files": files}


class ReplicaNode:
    """Pull-based replica (ReplicaNode.java): sync copies missing
    files, verifies checksums, switches atomically, reaps old gens."""

    def __init__(self, root: str, keep_last: int = 1):
        self.root = root
        self.keep_last = keep_last
        os.makedirs(root, exist_ok=True)

    # -- state -----------------------------------------------------------------
    def _state(self) -> dict:
        path = os.path.join(self.root, _COMMITS_FILE)
        if not os.path.exists(path):
            return {"current": None, "commits": [], "snapshots": []}
        with open(path) as f:
            return json.load(f)

    def _write_state(self, state: dict) -> None:
        path = os.path.join(self.root, _COMMITS_FILE)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, path)  # atomic switch — a reader never tears

    def current_generation(self) -> Optional[int]:
        return self._state()["current"]

    # -- sync ------------------------------------------------------------------
    def sync(self, primary: PrimaryNode) -> Dict[str, int]:
        """Copy the primary's current commit; returns
        {generation, files_copied, files_skipped, bytes_copied}.
        Idempotent and resumable: files already present with matching
        (length, md5) are skipped (CopyOneFile's checksum verify)."""
        cs = primary.copy_state()
        gen = cs["generation"]
        dst_dir = os.path.join(self.root, _gen_dirname(gen))
        copied = skipped = nbytes = 0
        for rel, (length, digest) in cs["files"].items():
            dst = os.path.join(dst_dir, rel)
            if os.path.exists(dst) and _file_meta(dst) == (length, digest):
                skipped += 1
                continue
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            src = os.path.join(cs["dir"], rel)
            tmp = dst + ".copytmp"
            shutil.copyfile(src, tmp)
            if _file_meta(tmp) != (length, digest):  # torn source read
                os.remove(tmp)
                raise IOError(f"checksum mismatch copying {rel}")
            os.replace(tmp, dst)
            copied += 1
            nbytes += length
        state = self._state()
        if all(c["generation"] != gen for c in state["commits"]):
            state["commits"].append({"generation": gen})
        state["current"] = gen
        # ReplicaFileDeleter: drop generations outside the keep window,
        # never the one just switched to
        keep = {c["generation"] for c in state["commits"][-self.keep_last :]}
        keep.add(gen)
        pruned = [c["generation"] for c in state["commits"] if c["generation"] not in keep]
        state["commits"] = [c for c in state["commits"] if c["generation"] in keep]
        # switch first: a crash between the state write and the prune leaves
        # stale-but-harmless generation dirs; pruning first could leave
        # `current` pointing at a deleted generation
        self._write_state(state)
        for g in pruned:
            shutil.rmtree(
                os.path.join(self.root, _gen_dirname(g)), ignore_errors=True
            )
        return {
            "generation": gen,
            "files_copied": copied,
            "files_skipped": skipped,
            "bytes_copied": nbytes,
        }

    # -- readers ---------------------------------------------------------------
    def open(
        self, spark: SparkSession, generation: Optional[int] = None
    ) -> InvertedIndex:
        gen = generation if generation is not None else self.current_generation()
        if gen is None:
            raise ValueError("replica has no synced commit")
        return InvertedIndex.load(spark, os.path.join(self.root, _gen_dirname(gen)))
