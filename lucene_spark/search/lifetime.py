"""Searcher lifecycle management: SearcherManager + SearcherLifetimeManager.

Reference parity targets:
  - lucene/core/src/java/org/apache/lucene/search/SearcherManager.java:59
    (acquire the CURRENT searcher with a ref count; ``maybeRefresh``
    swaps in a reader over the newest commit; release decrements)
  - core/search/SearcherLifetimeManager.java:13 (record a searcher
    under its reader VERSION so a follow-on request — paging through
    results — can ``acquire(version)`` the exact point-in-time view it
    started from; ``prune(Pruner)`` ages out old versions)
  - SearcherLifetimeManager.java:123 (the prune quirk carried exactly:
    a tracker's age is ``now - recordTime of the NEXT NEWER tracker``
    — the time since it stopped being live — so the newest tracker is
    always age 0.0 and is never pruned by PruneByAge)
  - SearcherLifetimeManager.java:106 (PruneByAge: prune when
    ``age > maxAgeSec``)

Spark re-expression: a "searcher" is an :class:`InvertedIndex` opened
from an :class:`IndexCommits` generation (the version IS the commit
generation — Lucene's reader version is the same monotonic commit
counter).  Ref-counting gates when a pruned generation's cached
DataFrames may be released; the snapshot/release protocol of
``IndexCommits`` protects the on-disk files the same way
SnapshotDeletionPolicy does for the reference.  All bookkeeping is
driver-side; the data plane is untouched.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

__all__ = [
    "SearcherManager",
    "SearcherLifetimeManager",
    "PruneByAge",
    "ControlledReopenController",
]


class SearcherManager:
    """SearcherManager.java:59 over an :class:`IndexCommits` root:
    ``acquire()`` returns the current-generation index (ref-counted),
    ``maybe_refresh()`` opens the newest committed generation when it
    advanced, ``release()`` decrements."""

    def __init__(self, commits):
        self._commits = commits
        self._gen = commits.current_generation()
        self._index = commits.open(self._gen) if self._gen is not None else None
        # id(index) -> [generation, outstanding refs, index]: the slot
        # holds a STRONG reference to the index so a live slot's id()
        # can never be recycled by a new object; zero-ref slots for
        # superseded generations are pruned on refresh
        self._refs: Dict[int, list] = {}

    @property
    def current_generation(self) -> Optional[int]:
        return self._gen

    def acquire(self):
        if self._index is None:
            raise RuntimeError("no committed generation to acquire")
        slot = self._refs.setdefault(id(self._index), [self._gen, 0, self._index])
        slot[1] += 1
        return self._index

    def release(self, index) -> None:
        slot = self._refs.get(id(index))
        if slot is None or slot[2] is not index or slot[1] <= 0:
            raise ValueError("release of an index not acquired from this manager")
        slot[1] -= 1

    def maybe_refresh(self) -> bool:
        """True when a newer commit was swapped in (maybeRefresh
        contract: cheap no-op when current)."""
        newest = self._commits.current_generation()
        if newest == self._gen:
            return False
        for li in getattr(self, "_listeners", []):
            li.before_refresh()
        self._index = self._commits.open(newest)
        self._gen = newest
        for li in getattr(self, "_listeners", []):
            li.after_refresh(True)
        # reap dead slots (superseded generation, no outstanding refs)
        for key in [k for k, s in self._refs.items() if s[1] <= 0 and s[0] != newest]:
            del self._refs[key]
        return True


@dataclass
class _Tracker:
    searcher: object
    version: int
    record_time_sec: float
    refs: int = 0


class PruneByAge:
    """SearcherLifetimeManager.PruneByAge (java:106)."""

    def __init__(self, max_age_sec: float):
        if max_age_sec < 0:
            raise ValueError("max_age_sec must be >= 0")
        self.max_age_sec = max_age_sec

    def do_prune(self, age_sec: float, searcher: object) -> bool:
        return age_sec > self.max_age_sec


class SearcherLifetimeManager:
    """SearcherLifetimeManager.java:13 — version-pinned searchers for
    consistent paging.  ``clock`` is injectable for deterministic
    tests."""

    def __init__(self, clock: Optional[Callable[[], float]] = None):
        self._clock = clock or time.monotonic
        self._trackers: Dict[int, _Tracker] = {}
        self._closed = False

    def record(self, searcher: object, version: int) -> int:
        """Register ``searcher`` under its version; re-recording the
        same version must present the same searcher (java:57-77
        ensureOpen + same-instance assertion)."""
        if self._closed:
            raise RuntimeError("this SearcherLifetimeManager is closed")
        cur = self._trackers.get(version)
        if cur is not None:
            if cur.searcher is not searcher:
                raise ValueError(
                    f"different searcher already recorded for version {version}"
                )
            return version
        self._trackers[version] = _Tracker(
            searcher=searcher, version=version, record_time_sec=self._clock()
        )
        return version

    def acquire(self, version: int):
        """The searcher recorded under ``version``, or None if pruned
        (java:84-92: callers must handle None by falling back to the
        current searcher)."""
        t = self._trackers.get(version)
        if t is None:
            return None
        t.refs += 1
        return t.searcher

    def release(self, searcher: object) -> None:
        for t in self._trackers.values():
            if t.searcher is searcher and t.refs > 0:
                t.refs -= 1
                return
        raise ValueError("release of a searcher not acquired from this manager")

    def prune(self, pruner) -> List[int]:
        """Apply ``pruner`` newest-first with the reference's age rule:
        the newest tracker is age 0.0; each older tracker's age is
        ``now - record_time of the next newer one``.  Returns the
        pruned versions."""
        trackers = sorted(
            self._trackers.values(), key=lambda t: -t.record_time_sec
        )
        now = self._clock()
        last_record = 0.0
        pruned: List[int] = []
        for t in trackers:
            age = 0.0 if last_record == 0.0 else now - last_record
            if pruner.do_prune(age, t.searcher):
                del self._trackers[t.version]
                pruned.append(t.version)
            last_record = t.record_time_sec
        return pruned

    def versions(self) -> List[int]:
        return sorted(self._trackers)

    def close(self) -> None:
        self._closed = True
        self._trackers.clear()


class ControlledReopenController:
    """ControlledRealTimeReopenThread analog
    (core/search/ControlledRealTimeReopenThread.java:11) — synchronous
    driver-side pacing instead of a thread, same contract:

      - ``targetMaxStaleSec``: ordinary searches tolerate this much
        staleness; :meth:`run_once` (the reopen thread's periodic body)
        refreshes when it elapsed.
      - ``targetMinStaleSec``: once a caller WAITS for a specific
        generation, refresh that much sooner — but never more often
        (java:30-41; max < min raises, as in the reference ctor).
      - :meth:`wait_for_generation` returns True once the searcher
        covers the target commit generation, refreshing (min-stale
        paced) as needed; False when the generation is not yet
        committed (the synchronous stand-in for the reference's
        blocking wait / timeout=False return, java:89).
    """

    def __init__(
        self,
        manager: "SearcherManager",
        target_max_stale_sec: float,
        target_min_stale_sec: float,
        clock: Optional[Callable[[], float]] = None,
    ):
        if target_max_stale_sec < target_min_stale_sec:
            raise ValueError(
                f"targetMaxScaleSec (= {target_max_stale_sec}) < "
                f"targetMinStaleSec (= {target_min_stale_sec})"
            )
        self._manager = manager
        self._max_stale = target_max_stale_sec
        self._min_stale = target_min_stale_sec
        self._clock = clock or time.monotonic
        self._last_refresh = self._clock()

    @property
    def searching_generation(self) -> Optional[int]:
        return self._manager.current_generation

    def run_once(self) -> bool:
        """The reopen thread's periodic body: refresh when the ordinary
        staleness budget elapsed.  Returns whether a refresh ran."""
        now = self._clock()
        if now - self._last_refresh >= self._max_stale:
            self._last_refresh = now
            return self._manager.maybe_refresh()
        return False

    def wait_for_generation(self, target_gen: int) -> bool:
        cur = self._manager.current_generation
        if cur is not None and cur >= target_gen:
            return True
        now = self._clock()
        if now - self._last_refresh < self._min_stale:
            # min-stale pacing: a waiter may pull the reopen earlier
            # than max-stale, but never tighter than min-stale
            return False
        self._last_refresh = now
        self._manager.maybe_refresh()
        cur = self._manager.current_generation
        return cur is not None and cur >= target_gen


class LiveFieldValues:
    """LiveFieldValues.java:33 — NRT get-by-id that tracks each doc's
    field value from ``add()`` until it becomes visible via a
    refreshed searcher: lookups try the live map, then the
    being-refreshed map, then the searcher.

    ``delete(id)`` records the missing sentinel so a deleted-but-not-
    yet-refreshed id reads as absent (java:61).  The double-buffer
    swap mirrors beforeRefresh/afterRefresh (java:30-48) with one
    documented divergence: listeners fire only on an ACTUAL generation
    swap.  The reference may clear buffers on a no-op refresh because
    its NRT reader already reflects those writes; our searcher only
    reflects adds at commit generations, so clearing early would drop
    values that are not yet searchable.
    """

    _MISSING = object()

    def __init__(self, manager: "SearcherManager", searcher_lookup=None):
        self._mgr = manager
        self._lookup = searcher_lookup
        self._current: Dict[str, object] = {}
        self._old: Dict[str, object] = {}
        manager._listeners = getattr(manager, "_listeners", [])
        manager._listeners.append(self)

    def close(self) -> None:
        self._mgr._listeners.remove(self)

    # -- ReferenceManager.RefreshListener ---------------------------------
    def before_refresh(self) -> None:
        self._old = self._current
        self._current = {}

    def after_refresh(self, did_refresh: bool) -> None:
        self._old = {}

    # -- writer-side hooks --------------------------------------------------
    def add(self, id_: str, value) -> None:
        self._current[id_] = value

    def delete(self, id_: str) -> None:
        self._current[id_] = self._MISSING

    def size(self) -> int:
        return len(self._current) + len(self._old)

    def get(self, id_: str):
        for m in (self._current, self._old):
            v = m.get(id_, None)
            if v is self._MISSING:
                return None  # deleted, deletion not yet refreshed
            if v is not None:
                return v
        if self._lookup is None:
            return None
        idx = self._mgr.acquire()
        try:
            return self._lookup(idx, id_)
        finally:
            self._mgr.release(idx)
