"""SortedNumericSortField / SortedSetSortField selector analogs."""

import pytest

from lucene_spark.search.sortselectors import (
    sorted_numeric_topk,
    sorted_set_topk,
)


@pytest.fixture(scope="module")
def num_docs(spark):
    rows = [
        (0, [5, 9]),
        (1, [2, 7]),
        (2, []),       # empty set -> missing value 0
        (3, [3]),
        (4, None),     # null set -> missing value 0
        (5, [-4, 10]),
    ]
    return spark.createDataFrame(rows, "doc_id long, vals array<long>")


@pytest.fixture(scope="module")
def str_docs(spark):
    rows = [
        (0, ["delta", "alpha", "echo"]),   # sorted: alpha delta echo
        (1, ["bravo", "charlie"]),         # sorted: bravo charlie
        (2, []),
        (3, ["zulu"]),
    ]
    return spark.createDataFrame(rows, "doc_id long, terms array<string>")


def test_numeric_min_with_missing_zero(num_docs):
    rows = sorted_numeric_topk(num_docs, "vals", "min", k=10).collect()
    # keys: 0->5, 1->2, 2->0, 3->3, 4->0, 5->-4; asc with docID ties
    assert [(r["doc_id"], r["sort_key"]) for r in rows] == [
        (5, -4), (2, 0), (4, 0), (1, 2), (3, 3), (0, 5),
    ]


def test_numeric_max_reverse(num_docs):
    rows = sorted_numeric_topk(num_docs, "vals", "max", reverse=True, k=3).collect()
    assert [(r["doc_id"], r["sort_key"]) for r in rows] == [
        (5, 10), (0, 9), (1, 7),
    ]


def test_numeric_custom_missing(num_docs):
    rows = sorted_numeric_topk(
        num_docs, "vals", "min", missing_value=100, k=10
    ).collect()
    assert [r["doc_id"] for r in rows][-2:] == [2, 4]  # missing last now


def test_set_min_missing_first(str_docs):
    rows = sorted_set_topk(str_docs, "terms", "min", k=10).collect()
    assert [r["doc_id"] for r in rows] == [2, 0, 1, 3]
    assert rows[1]["sort_key"] == "alpha"


def test_set_max_missing_last(str_docs):
    rows = sorted_set_topk(
        str_docs, "terms", "max", missing="last", k=10
    ).collect()
    # keys: 0->echo, 1->charlie, 3->zulu; missing doc 2 last
    assert [r["doc_id"] for r in rows] == [1, 0, 3, 2]


def test_set_middle_selectors(str_docs):
    # doc 0 sorted terms: alpha delta echo (n=3): middle_min = delta,
    # middle_max = delta; doc 1 (n=2): middle_min = bravo,
    # middle_max = charlie (tie toward min/max)
    mn = {
        r["doc_id"]: r["sort_key"]
        for r in sorted_set_topk(str_docs, "terms", "middle_min", k=10).collect()
    }
    mx = {
        r["doc_id"]: r["sort_key"]
        for r in sorted_set_topk(str_docs, "terms", "middle_max", k=10).collect()
    }
    assert mn[0] == "delta" and mx[0] == "delta"
    assert mn[1] == "bravo" and mx[1] == "charlie"
    assert mn[3] == "zulu" and mx[3] == "zulu"


def test_reverse_missing_first_stays_first(str_docs):
    rows = sorted_set_topk(
        str_docs, "terms", "min", reverse=True, missing="first", k=10
    ).collect()
    assert rows[0]["doc_id"] == 2  # FIRST names the result position


def test_bad_selector(num_docs, str_docs):
    with pytest.raises(ValueError):
        sorted_numeric_topk(num_docs, "vals", "middle_min")
    with pytest.raises(ValueError):
        sorted_set_topk(str_docs, "terms", "median")
    with pytest.raises(ValueError):
        sorted_set_topk(str_docs, "terms", "min", missing="middle")
