"""IndexOptions.DOCS (freq clamp) and omitNorms semantics."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.search import IndexSearcher, TermQuery


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "hash hash hash join"),
            (1, "hash join join sort merge scan filter group order limit"),
            (2, "hash"),
            (3, "sort merge"),
        ],
        ["doc_id", "text"],
    )


def test_docs_only_freq_clamp(docs):
    idx = InvertedIndex.build(
        docs, analyzer="simple", docs_per_segment=2, index_options="docs"
    )
    # totalTermFreq == docFreq for every term (IndexOptions.DOCS)
    bad = idx.terms.filter(F.col("total_term_freq") != F.col("doc_freq")).count()
    assert bad == 0
    # sumTotalTermFreq == sumDocFreq
    assert idx.sum_total_term_freq == (
        idx.terms.agg(F.sum("doc_freq")).collect()[0][0]
    )
    # docs 0 and 2: 'hash' freq clamps to 1; doc 0 has dl=2 (unique),
    # doc 2 dl=1 — doc 2 (shorter) outranks doc 0, which outranks the
    # long doc 1; freq differences are gone
    hits = IndexSearcher(idx).search(TermQuery("hash"), k=10).collect()
    assert [r["doc_id"] for r in hits] == [2, 0, 1]


def test_omit_norms_ignores_length(docs):
    idx = InvertedIndex.build(
        docs, analyzer="simple", docs_per_segment=2, omit_norms=True
    )
    # 'sort' appears once in doc 1 (long) and once in doc 3 (short):
    # identical scores with norms omitted → tie broken by doc_id
    hits = IndexSearcher(idx).search(TermQuery("sort"), k=10).collect()
    assert [r["doc_id"] for r in hits] == [1, 3]
    assert hits[0]["score"] == hits[1]["score"]
    # collection stats keep TRUE lengths (omitNorms only drops norms)
    assert idx.sum_total_term_freq == 4 + 10 + 1 + 2


def test_docs_only_rejects_positions(docs):
    with pytest.raises(ValueError):
        InvertedIndex.build(docs, index_options="docs", positions=True)
    with pytest.raises(ValueError):
        InvertedIndex.build(docs, index_options="nope")


def test_default_unchanged(docs):
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=2)
    hits = IndexSearcher(idx).search(TermQuery("hash"), k=10).collect()
    # with freqs, doc 0 (freq 3, short) wins
    assert hits[0]["doc_id"] == 0
