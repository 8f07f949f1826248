"""searchAfter paging regression: 4-dp display-rounding ties across the
page boundary must not change the page-2 row set.

Round-1 bug: the page-2 anchor filter compared the ROUNDED score, so
docs whose raw float64 scores differ but round to the same 4-dp value
re-entered page 2 (semantics reference: Lucene searchAfter compares
exact (score, doc) — search/IndexSearcher.java:576-588).
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search.parity import bm25_topk_f64, search_after_f64


@pytest.fixture(scope="module")
def tie_index(spark):
    # 8 docs: "x" repeated 1001+i times. dl in [1002..1009] quantizes to
    # ONE norm byte (SmallFloat 4-bit mantissa), so raw BM25 scores
    # differ only through freq — consecutive freqs at f~1000 differ by
    # ~1e-6 relative, i.e. every doc rounds to the same 4-dp score while
    # raw scores are strictly increasing with freq.
    rows = [(i, "x " * (1001 + i) + "y", "en", "src1", 2 * (1002 + i)) for i in range(8)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    return InvertedIndex.build(docs, analyzer="simple", docs_per_segment=4)


def test_page2_is_rows_k_to_2k(tie_index):
    k = 3
    full = bm25_topk_f64(tie_index, {"x": 1.0}, k=2 * k).collect()
    page2 = search_after_f64(tie_index, {"x": 1.0}, k=k).collect()
    # all 8 docs collide at 4 dp — the manufactured tie
    assert len({r["score"] for r in full}) == 1
    assert [r["doc_id"] for r in page2] == [r["doc_id"] for r in full[k:]]
    assert len(page2) == k


def test_page2_excludes_page1(tie_index):
    k = 3
    page1 = {r["doc_id"] for r in bm25_topk_f64(tie_index, {"x": 1.0}, k=k).collect()}
    page2 = {r["doc_id"] for r in search_after_f64(tie_index, {"x": 1.0}, k=k).collect()}
    assert not (page1 & page2)
