"""SearcherManager + SearcherLifetimeManager analogs
(core/search/SearcherManager.java:59,
SearcherLifetimeManager.java:13,106,123) — version-pinned paging,
maybeRefresh, and the exact prune age rule."""

import pandas as pd
import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.index.commits import IndexCommits
from lucene_spark.search.lifetime import (
    PruneByAge,
    SearcherLifetimeManager,
    SearcherManager,
)


def _idx(spark, tag):
    return InvertedIndex.build(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": range(8), "text": [f"{tag} word"] * 8})
        ),
        analyzer="simple",
        docs_per_segment=8,
    )


# ------------------------------------------------------ SearcherManager


def test_manager_acquire_refresh_release(spark, tmp_path):
    commits = IndexCommits(spark, str(tmp_path / "c"), keep_last=3)
    commits.commit(_idx(spark, "alpha"))
    mgr = SearcherManager(commits)
    s0 = mgr.acquire()
    assert mgr.current_generation == 0
    assert not mgr.maybe_refresh()  # current → cheap no-op

    commits.commit(_idx(spark, "beta"))
    assert mgr.maybe_refresh()
    assert mgr.current_generation == 1
    s1 = mgr.acquire()
    assert s1 is not s0
    mgr.release(s0)
    mgr.release(s1)
    with pytest.raises(ValueError):
        mgr.release(s1)  # over-release


def test_manager_requires_a_commit(spark, tmp_path):
    commits = IndexCommits(spark, str(tmp_path / "c2"))
    mgr = SearcherManager(commits)
    with pytest.raises(RuntimeError):
        mgr.acquire()


# ---------------------------------------------- SearcherLifetimeManager


def _fixed_clock(values):
    it = iter(values)
    last = [None]

    def clock():
        try:
            last[0] = next(it)
        except StopIteration:
            pass
        return last[0]

    return clock


def test_record_acquire_release_cycle():
    mgr = SearcherLifetimeManager(clock=_fixed_clock([1.0, 2.0, 3.0]))
    s_a, s_b = object(), object()
    assert mgr.record(s_a, version=7) == 7
    assert mgr.record(s_a, version=7) == 7  # same instance re-record ok
    with pytest.raises(ValueError):
        mgr.record(s_b, version=7)  # different searcher, same version
    mgr.record(s_b, version=8)
    assert mgr.acquire(7) is s_a
    assert mgr.acquire(99) is None  # pruned/unknown → None contract
    mgr.release(s_a)
    with pytest.raises(ValueError):
        mgr.release(s_a)


def test_prune_age_is_relative_to_next_newer():
    # record times: v1@10, v2@100; now=130.
    # newest (v2) age = 0.0 (never pruned by age);
    # v1 age = now - v2.recordTime = 30 (NOT now - v1.recordTime = 120)
    mgr = SearcherLifetimeManager(clock=_fixed_clock([10.0, 100.0, 130.0]))
    s1, s2 = object(), object()
    mgr.record(s1, version=1)
    mgr.record(s2, version=2)
    assert mgr.prune(PruneByAge(50.0)) == []  # 30 <= 50 keeps v1
    mgr2 = SearcherLifetimeManager(clock=_fixed_clock([10.0, 100.0, 130.0]))
    mgr2.record(s1, version=1)
    mgr2.record(s2, version=2)
    assert mgr2.prune(PruneByAge(20.0)) == [1]  # 30 > 20 prunes v1 only
    assert mgr2.versions() == [2]


def test_newest_never_pruned_by_age():
    mgr = SearcherLifetimeManager(clock=_fixed_clock([5.0, 1e9]))
    mgr.record(object(), version=42)
    assert mgr.prune(PruneByAge(0.0)) == []  # age 0.0, 0.0 > 0.0 false
    assert mgr.versions() == [42]


def test_close_clears_and_blocks_record():
    mgr = SearcherLifetimeManager(clock=_fixed_clock([1.0]))
    mgr.record(object(), version=1)
    mgr.close()
    assert mgr.versions() == []
    with pytest.raises(RuntimeError):
        mgr.record(object(), version=2)


def test_prune_by_age_validates():
    with pytest.raises(ValueError):
        PruneByAge(-1.0)


def test_paging_scenario_with_commits(spark, tmp_path):
    """End-to-end: page 2 of a query served from the SAME generation
    the user saw page 1 on, even after a new commit."""
    commits = IndexCommits(spark, str(tmp_path / "p"), keep_last=5)
    gen0 = commits.commit(_idx(spark, "alpha"))
    lifetime = SearcherLifetimeManager()
    mgr = SearcherManager(commits)
    s = mgr.acquire()
    lifetime.record(s, version=gen0)

    commits.commit(_idx(spark, "beta"))
    mgr.maybe_refresh()

    pinned = lifetime.acquire(gen0)
    assert pinned is s  # the exact point-in-time view
    assert pinned.terms.filter("term = 'alpha'").count() == 1


# -------------------------------------- ControlledRealTimeReopenThread


def test_reopen_controller_pacing(spark, tmp_path):
    from lucene_spark.search.lifetime import ControlledReopenController

    commits = IndexCommits(spark, str(tmp_path / "r"), keep_last=5)
    commits.commit(_idx(spark, "alpha"))
    mgr = SearcherManager(commits)

    t = {"now": 0.0}
    ctl = ControlledReopenController(
        mgr, target_max_stale_sec=10.0, target_min_stale_sec=2.0,
        clock=lambda: t["now"],
    )
    gen1 = commits.commit(_idx(spark, "beta"))

    # ordinary pacing: before max-stale elapses, run_once is a no-op
    t["now"] = 5.0
    assert not ctl.run_once()
    assert ctl.searching_generation == 0

    # a waiter pulls the refresh at min-stale (2s), well before the
    # 10s ordinary budget: at t=5 the wait refreshes and sees gen1
    assert ctl.wait_for_generation(gen1)
    assert ctl.searching_generation == gen1


def test_reopen_controller_wait_refreshes_at_min_stale(spark, tmp_path):
    from lucene_spark.search.lifetime import ControlledReopenController

    commits = IndexCommits(spark, str(tmp_path / "r2"), keep_last=5)
    commits.commit(_idx(spark, "alpha"))
    mgr = SearcherManager(commits)
    t = {"now": 0.0}
    ctl = ControlledReopenController(
        mgr, target_max_stale_sec=10.0, target_min_stale_sec=2.0,
        clock=lambda: t["now"],
    )
    gen1 = commits.commit(_idx(spark, "beta"))

    t["now"] = 1.0  # under min-stale: waiter must NOT force a refresh
    assert not ctl.wait_for_generation(gen1)
    assert ctl.searching_generation == 0

    t["now"] = 3.0  # past min-stale: waiter refreshes and sees gen1
    assert ctl.wait_for_generation(gen1)
    assert ctl.searching_generation == gen1

    # already satisfied: immediate True with no pacing involved
    t["now"] = 3.1
    assert ctl.wait_for_generation(gen1)


def test_reopen_controller_run_once_after_max_stale(spark, tmp_path):
    from lucene_spark.search.lifetime import ControlledReopenController

    commits = IndexCommits(spark, str(tmp_path / "r3"), keep_last=5)
    commits.commit(_idx(spark, "alpha"))
    mgr = SearcherManager(commits)
    t = {"now": 0.0}
    ctl = ControlledReopenController(
        mgr, target_max_stale_sec=10.0, target_min_stale_sec=2.0,
        clock=lambda: t["now"],
    )
    commits.commit(_idx(spark, "beta"))
    t["now"] = 10.0
    assert ctl.run_once()
    assert ctl.searching_generation == 1


def test_reopen_controller_validates_stale_bounds(spark, tmp_path):
    from lucene_spark.search.lifetime import ControlledReopenController

    commits = IndexCommits(spark, str(tmp_path / "r4"), keep_last=5)
    commits.commit(_idx(spark, "alpha"))
    mgr = SearcherManager(commits)
    with pytest.raises(ValueError):
        ControlledReopenController(mgr, 1.0, 2.0)


def test_wait_for_uncommitted_generation_is_false(spark, tmp_path):
    from lucene_spark.search.lifetime import ControlledReopenController

    commits = IndexCommits(spark, str(tmp_path / "r5"), keep_last=5)
    commits.commit(_idx(spark, "alpha"))
    mgr = SearcherManager(commits)
    t = {"now": 100.0}
    ctl = ControlledReopenController(
        mgr, 10.0, 2.0, clock=lambda: t["now"]
    )
    t["now"] = 200.0
    assert not ctl.wait_for_generation(99)  # never committed


# ------------------------------------------------------ LiveFieldValues


def test_live_field_values_cycle(spark, tmp_path):
    from lucene_spark.search.lifetime import LiveFieldValues

    commits = IndexCommits(spark, str(tmp_path / "lfv"), keep_last=3)
    commits.commit(_idx(spark, "alpha"))
    mgr = SearcherManager(commits)
    seen = {}

    def lookup(idx, id_):
        return seen.get(id_)

    lfv = LiveFieldValues(mgr, searcher_lookup=lookup)
    # buffered adds are visible immediately
    lfv.add("7", "v7")
    assert lfv.get("7") == "v7"
    assert lfv.size() == 1
    # deleted-but-not-refreshed reads as absent (the missing sentinel)
    lfv.delete("7")
    assert lfv.get("7") is None
    lfv.add("8", "v8")

    # a no-op refresh must NOT drop buffered values (documented
    # divergence: our searcher only advances at commit generations)
    assert not mgr.maybe_refresh()
    assert lfv.get("8") == "v8"

    # a real refresh makes the values searcher-visible: simulate by
    # publishing to the searcher-side store at commit time
    seen["8"] = "v8-from-searcher"
    commits.commit(_idx(spark, "beta"))
    assert mgr.maybe_refresh()
    assert lfv.size() == 0  # both maps cleared after the swap
    assert lfv.get("8") == "v8-from-searcher"  # falls through to searcher
    assert lfv.get("nope") is None

    lfv.close()
    lfv2_registered = getattr(mgr, "_listeners", [])
    assert lfv not in lfv2_registered
