"""UsageTrackingQueryCachingPolicy + CheckJoinIndex analogs."""

import pytest

from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    MatchAllDocsQuery,
    Occur,
    PrefixQuery,
    TermQuery,
)
from lucene_spark.search.querycache import (
    FrequencyTrackingRingBuffer,
    UsageTrackingQueryCachingPolicy,
)


def test_ring_buffer_window():
    # FrequencyTrackingRingBuffer.java:30 — counts decay as entries
    # fall out of the fixed window
    rb = FrequencyTrackingRingBuffer(3)
    for k in ["a", "a", "b", "c"]:
        rb.add(k)
    assert rb.frequency("a") == 1  # first 'a' fell out
    assert rb.frequency("b") == 1 and rb.frequency("c") == 1


def test_policy_thresholds():
    # UsageTrackingQueryCachingPolicy.java:122 — costly: 2, compound:
    # 4, plain: 5; TermQuery/MatchAll never cached (:56-75)
    p = UsageTrackingQueryCachingPolicy()
    costly = PrefixQuery("ha")
    p.on_use(costly)
    assert not p.should_cache(costly)
    p.on_use(costly)
    assert p.should_cache(costly)

    compound = BooleanQuery.of(
        BooleanClause(TermQuery("a"), Occur.SHOULD),
        BooleanClause(TermQuery("b"), Occur.SHOULD),
    )
    for i in range(3):
        p.on_use(compound)
        assert not p.should_cache(compound)
    p.on_use(compound)
    assert p.should_cache(compound)

    t = TermQuery("x")
    for _ in range(10):
        p.on_use(t)
    assert not p.should_cache(t)
    assert not p.should_cache(MatchAllDocsQuery())


def test_check_join_index(spark):
    from lucene_spark.search.blockjoin import check_join_index

    parents = spark.createDataFrame([(1,), (2,)], "pk bigint")
    ok_children = spark.createDataFrame([(1, 10), (2, 20)], "ck bigint, v bigint")
    out = check_join_index(parents, ok_children, "pk", "ck")
    assert out == {"parents": 2, "children": 2}

    orphan = spark.createDataFrame([(3, 30)], "ck bigint, v bigint")
    with pytest.raises(ValueError, match="orphan child"):
        check_join_index(parents, orphan, "pk", "ck")

    dup_parents = spark.createDataFrame([(1,), (1,)], "pk bigint")
    with pytest.raises(ValueError, match="duplicate parent"):
        check_join_index(dup_parents, ok_children, "pk", "ck")
