"""maxClauseCount guard + distributed multi-term expansion.

`search/MultiTermQuery.java:39-103` / `IndexSearcher$TooManyClauses`:
- boolean rewrite methods raise above the clause cap;
- the default constant-score rewrite must stay correct above the cap
  WITHOUT collecting the matched-term list to the driver (semi-join
  against the terms DataFrame).
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search import (
    ConstantScoreQuery,
    IndexSearcher,
    MultiTermFilterDocsQuery,
    PrefixQuery,
    TooManyClauses,
    get_max_clause_count,
    rewrite,
    set_max_clause_count,
)


@pytest.fixture(scope="module")
def wide_index(spark, documents):
    # Augment every third doc with 9 unique tokens id{doc}x{j} so a
    # PrefixQuery("id") matches ~3 * n_docs terms — far above a small
    # test cap, while the base 31-word vocab stays below it.
    extra = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("id"), F.col("doc_id"), F.lit(f"x{j}"))
            for j in range(9)
        ],
    )
    corpus = documents.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.concat_ws(" ", "text", extra)).otherwise(
            F.col("text")
        ),
    )
    return InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=64)


def test_boolean_rewrites_raise_above_cap(wide_index):
    old = get_max_clause_count()
    set_max_clause_count(16)
    try:
        for method in ("constant_score_boolean", "scoring_boolean"):
            with pytest.raises(TooManyClauses):
                rewrite(
                    PrefixQuery("id", rewrite_method=method), wide_index.terms
                )
        # under the cap the same methods expand normally
        q = rewrite(
            PrefixQuery("ha", rewrite_method="constant_score_boolean"),
            wide_index.terms,
        )
        assert not isinstance(q, MultiTermFilterDocsQuery)
    finally:
        set_max_clause_count(old)


def test_constant_score_distributes_above_cap(wide_index, documents):
    old = get_max_clause_count()
    set_max_clause_count(16)
    try:
        q = rewrite(PrefixQuery("id"), wide_index.terms)
        assert isinstance(q, ConstantScoreQuery)
        assert isinstance(q.query, MultiTermFilterDocsQuery)

        rows = IndexSearcher(wide_index).search(PrefixQuery("id"), k=100000).collect()
        expected = sorted(
            r["doc_id"]
            for r in documents.filter(F.col("doc_id") % 3 == 0)
            .select("doc_id")
            .collect()
        )
        assert sorted(r["doc_id"] for r in rows) == expected
        assert all(r["score"] == 1.0 for r in rows)
    finally:
        set_max_clause_count(old)


def test_semijoin_plan_has_no_term_literals(wide_index):
    """The above-cap plan must not embed a driver-collected term list."""
    old = get_max_clause_count()
    set_max_clause_count(16)
    try:
        searcher = IndexSearcher(wide_index)
        plan = searcher.search(PrefixQuery("id"), k=10)._jdf.queryExecution().toString()
        assert "id0x0" not in plan  # no expanded term literal anywhere
        assert plan.count("startswith") >= 1 or "StartsWith" in plan
    finally:
        set_max_clause_count(old)


def test_semijoin_matches_expanded_semantics(wide_index):
    """Above-cap semi-join result == below-cap expanded result."""
    searcher = IndexSearcher(wide_index)
    expanded = {
        r["doc_id"]: r["score"]
        for r in searcher.search(PrefixQuery("id"), k=1000).collect()
    }
    old = get_max_clause_count()
    set_max_clause_count(16)
    try:
        distributed = {
            r["doc_id"]: r["score"]
            for r in IndexSearcher(wide_index)
            .search(PrefixQuery("id"), k=1000)
            .collect()
        }
    finally:
        set_max_clause_count(old)
    assert distributed == expanded


def test_count_through_semijoin(wide_index, documents):
    old = get_max_clause_count()
    set_max_clause_count(16)
    try:
        n = IndexSearcher(wide_index).count(PrefixQuery("id"))
    finally:
        set_max_clause_count(old)
    assert n == documents.filter(F.col("doc_id") % 3 == 0).count()
