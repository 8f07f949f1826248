"""searchAfter over arbitrary field sorts (TopFieldCollector
after-bottom filtering): page concatenation equals the global sort,
pages are disjoint, anchors page correctly through ties."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.search.parity import search_after_sorted

SPEC = [("lang", "asc"), ("n", "desc")]


@pytest.fixture(scope="module")
def df(spark):
    rng = np.random.RandomState(9)
    rows = [
        (i, ["en", "de", "fr"][int(rng.randint(3))], int(rng.randint(5)))
        for i in range(100)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, lang string, n int")


def _global(rows):
    return sorted(rows, key=lambda r: (r[1], -r[2], r[0]))


def _pages(frame, k):
    pages, anchor = [], None
    while True:
        page = search_after_sorted(frame, SPEC, k=k, anchor=anchor).collect()
        if not page:
            return pages
        pages.append(page)
        last = page[-1]
        anchor = {"lang": last["lang"], "n": last["n"], "doc_id": last["doc_id"]}
        if len(page) < k:
            return pages


def test_pages_reconstruct_global_sort(df):
    rows, frame = df
    pages = _pages(frame, 15)
    flat = [(r["doc_id"], r["lang"], r["n"]) for p in pages for r in p]
    assert flat == _global(rows)


def test_page_after_anchor_strictly_follows(df):
    rows, frame = df
    g = _global(rows)
    a = g[29]
    anchor = {"lang": a[1], "n": a[2], "doc_id": a[0]}
    page = search_after_sorted(frame, SPEC, k=10, anchor=anchor).collect()
    assert [(r["doc_id"], r["lang"], r["n"]) for r in page] == g[30:40]


def test_first_page_is_topk(df):
    rows, frame = df
    page = search_after_sorted(frame, SPEC, k=7).collect()
    assert [(r["doc_id"], r["lang"], r["n"]) for r in page] == _global(rows)[:7]
