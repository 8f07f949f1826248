"""misc-module analogs: HighFreqTerms ordering, DocValuesStats vs a
local reference, DiversifiedTopDocsCollector per-key caps, MemoryIndex
degenerate BM25, dynamic ranges vs an exact sequential reference, and
the query profiler's tree/counts.
"""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.search import (
    BooleanClause,
    BooleanQuery,
    IndexSearcher,
    Occur,
    TermQuery,
)
from lucene_spark.search.facets import dynamic_range_facets
from lucene_spark.search.memoryindex import memory_index_scores
from lucene_spark.search.misc import (
    diversified_topk,
    doc_values_stats,
    high_freq_terms,
)
from lucene_spark.search.profiler import profile_df, profile_tree

_DOCS = [
    (0, "a b a c", "en"),
    (1, "a a a", "en"),
    (2, "b c d", "fr"),
    (3, "a d", "fr"),
    (4, "c c b", "en"),
    (5, "e", "de"),
]


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(_DOCS, ["doc_id", "text", "lang"]).cache()


@pytest.fixture(scope="module")
def small_idx(small):
    return InvertedIndex.build(small, analyzer="simple", docs_per_segment=4)


def test_high_freq_terms_orders(small_idx):
    by_ttf = [r["term"] for r in high_freq_terms(small_idx.terms, 3, "total_term_freq").collect()]
    assert by_ttf[0] == "a"  # ttf 5
    by_df = [
        (r["term"], r["doc_freq"])
        for r in high_freq_terms(small_idx.terms, 2, "doc_freq").collect()
    ]
    # a, b, c all df=3 — tie broken by term text asc
    assert by_df == [("a", 3), ("b", 3)]
    with pytest.raises(ValueError):
        high_freq_terms(small_idx.terms, 3, "nope")


def test_doc_values_stats_matches_local(spark):
    rows = [(i, None if i % 3 == 0 else i * 2) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "v"])
    got = doc_values_stats(df, "v").collect()[0]
    vals = [v for _, v in rows if v is not None]
    n = len(vals)
    mean = sum(vals) / n
    var = sum(x * x for x in vals) / n - mean * mean
    assert got["cnt"] == n
    assert got["missing"] == 20 - n
    assert got["min_v"] == min(vals) and got["max_v"] == max(vals)
    assert got["sum_v"] == sum(vals)
    assert got["mean_v"] == pytest.approx(mean)
    assert got["variance"] == pytest.approx(var, abs=1e-5)
    assert got["stdev"] == pytest.approx(math.sqrt(var), abs=1e-5)


def test_diversified_caps_per_key(spark):
    rows = [
        (0, "en", 9.0),
        (1, "en", 8.0),
        (2, "en", 7.0),  # third-best en — must be diversified away
        (3, "fr", 6.0),
        (4, "fr", 5.0),
        (5, "de", 1.0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "s"])
    got = [r["doc_id"] for r in diversified_topk(df, "lang", 2, 5).collect()]
    assert got == [0, 1, 3, 4, 5]
    # score ties break by doc_id asc inside a key
    tie = spark.createDataFrame(
        [(7, "en", 2.0), (6, "en", 2.0), (5, "en", 2.0)], ["doc_id", "lang", "s"]
    )
    got = [r["doc_id"] for r in diversified_topk(tie, "lang", 2, 5).collect()]
    assert got == [5, 6]


def test_memory_index_degenerate_bm25(small):
    got = {
        r["doc_id"]: r["score"]
        for r in memory_index_scores(small, {"a": 1.0}, k=10).collect()
    }
    idf = math.log(1 + 0.5 / 1.5)

    def score(tf):
        return round(idf * tf / (tf + 1.2), 4)

    # doc 1: tf=3, doc 0: tf=2, doc 3: tf=1; docs 2/4/5 absent
    assert got == {1: score(3), 0: score(2), 3: score(1)}


def _ref_dynamic_ranges(pairs, top_n):
    """DynamicRangeUtil.computeDynamicNumericRanges re-derived locally
    (sequential greedy, facet/range/DynamicRangeUtil.java:204)."""
    pairs = sorted((v, w) for v, w in pairs if w > 0)
    if not pairs or top_n <= 0:
        return []
    total = sum(w for _, w in pairs)
    target = total / min(top_n, len(pairs))
    out, acc, vsum, cnt, min_i = [], 0, 0, 0, 0
    for i, (v, w) in enumerate(pairs):
        acc += w
        vsum += v
        cnt += 1
        if acc >= target:
            out.append((cnt, acc, pairs[min_i][0], v, vsum / cnt))
            acc = vsum = cnt = 0
            min_i = i + 1
    if min_i < len(pairs):
        out.append((cnt, acc, pairs[min_i][0], pairs[-1][0], vsum / cnt))
    return out


@pytest.mark.parametrize("top_n", [1, 3, 5])
def test_dynamic_ranges_match_sequential_reference(spark, top_n):
    pairs = [((i * 37) % 50, (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(pairs, ["v", "w"])
    got = [
        (r["cnt"], r["weight"], r["min_v"], r["max_v"], r["centroid"])
        for r in dynamic_range_facets(df, "v", "w", top_n, num_partitions=4)
        .orderBy("bucket")
        .collect()
    ]
    want = _ref_dynamic_ranges(pairs, top_n)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4]
        assert g[4] == pytest.approx(w[4])


def test_dynamic_ranges_skips_zero_weights(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 5)], ["v", "w"]
    )
    got = dynamic_range_facets(df, "v", "w", 2).collect()
    assert [r["cnt"] for r in got] == [1, 1]
    assert [r["min_v"] for r in got] == [2, 3]


def test_profiler_counts_and_tree(small_idx):
    q = BooleanQuery.of(
        BooleanClause(TermQuery("a"), Occur.MUST),
        BooleanClause(TermQuery("b"), Occur.SHOULD),
        BooleanClause(TermQuery("d"), Occur.MUST_NOT),
    )
    searcher = IndexSearcher(small_idx)
    rows = profile_df(searcher, q).orderBy("node").collect()
    assert [(r["name"], r["description"], r["docs"]) for r in rows] == [
        ("BooleanQuery", "3 clauses", 2),  # a ∧ ¬d → docs 0, 1
        ("TermQuery", "a", 3),
        ("TermQuery", "b", 3),
        ("TermQuery", "d", 2),
    ]
    tree = profile_tree(searcher, q)
    assert tree["name"] == "BooleanQuery" and tree["docs"] == 2
    assert [c["description"] for c in tree["children"]] == ["a", "b", "d"]
    assert all(c["time_ms"] >= 0 for c in tree["children"])
