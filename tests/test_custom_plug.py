"""Pluggable analyzer callables + custom Collector surface."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.search import IndexSearcher, TermQuery, parse_query


def _make_shout_analyzer():
    """Custom chain: uppercase whitespace tokens, drop 1-char tokens.

    Built as a closure so cloudpickle ships it by VALUE — a module-level
    function in tests/ would be pickled by reference and fail to import
    on executors."""

    def shout(text):
        out = []
        pos = 0
        for t in text.split(" "):
            if not t:
                continue
            if len(t) > 1:
                out.append((t.upper(), pos))
            pos += 1
        return out

    return shout


_shout_analyzer = _make_shout_analyzer()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "hash join a b"),
            (1, "hash hash join"),
            (2, "x y z join"),
        ],
        ["doc_id", "text"],
    )


def test_callable_analyzer_build_and_search(docs):
    idx = InvertedIndex.build(docs, analyzer=_shout_analyzer, docs_per_segment=2)
    terms = {r["term"] for r in idx.terms.collect()}
    assert "HASH" in terms and "JOIN" in terms
    # 1-char tokens dropped by the custom chain
    assert not any(len(t) == 1 for t in terms)
    hits = {r["doc_id"] for r in IndexSearcher(idx).search(TermQuery("HASH"), k=10).collect()}
    assert hits == {0, 1}
    # positions flow through the custom analyzer too
    pidx = InvertedIndex.build(
        docs, analyzer=_shout_analyzer, docs_per_segment=2, positions=True
    )
    from lucene_spark.search.positional import phrase_freqs

    ph = {r["doc_id"] for r in phrase_freqs(pidx, ["HASH", "JOIN"]).collect()}
    assert ph == {0, 1}  # doc 1: positions 0,1(hash) 2(join) → adjacency at 1-2


def test_unknown_analyzer_still_rejected(docs):
    with pytest.raises(ValueError):
        InvertedIndex.build(docs, analyzer="nope")


def test_custom_collector(docs):
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=2)
    s = IndexSearcher(idx)
    q = parse_query("hash OR join")

    # TotalHitCount-style collector
    assert s.search_with_collector(q, lambda df: df.count()) == 3

    # histogram collector: score sum per bucket of matched clause count
    def histogram(df):
        return {
            r["b"]: r["n"]
            for r in df.select(F.floor(F.col("score")).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    h = s.search_with_collector(q, histogram)
    assert sum(h.values()) == 3

    # max-score collector agrees with search()'s top hit
    top = s.search(q, k=1).collect()[0]
    mx = s.search_with_collector(
        q, lambda df: df.agg(F.max("score").alias("m")).collect()[0]["m"]
    )
    assert mx == pytest.approx(top["score"], rel=1e-6)
