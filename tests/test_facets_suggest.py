"""Taxonomy facets + suggesters: counts vs local groupby, prefix/infix
ordering, drill-down prefix semantics.
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import InvertedIndex
from lucene_spark.search.facets import drill_down, taxonomy_children
from lucene_spark.search.suggest import infix_suggest, prefix_suggest

_ROWS = [
    (0, "eu/fr/paris"),
    (1, "eu/fr/lyon"),
    (2, "eu/de/berlin"),
    (3, "eu/fr/paris"),
    (4, "us/ca/sf"),
    (5, "us/ny/nyc"),
    (6, "eu/de/munich"),
    (7, "us/ca/la"),
    (8, "eu"),  # non-leaf doc: counts at root, invisible under eu/*'s children? no — child of root 'eu'; has no level-2 component
]


@pytest.fixture(scope="module")
def cats(spark):
    return spark.createDataFrame(_ROWS, ["doc_id", "cat"]).cache()


def test_root_children(cats):
    got = [(r["child"], r["cnt"]) for r in taxonomy_children(cats, "cat").collect()]
    assert got == [("eu", 6), ("us", 3)]


def test_children_under_path(cats):
    got = [
        (r["child"], r["cnt"])
        for r in taxonomy_children(cats, "cat", ("eu",)).collect()
    ]
    # doc 8 ("eu") has no child component under eu and must not count
    assert got == [("fr", 3), ("de", 2)]
    got = [
        (r["child"], r["cnt"])
        for r in taxonomy_children(cats, "cat", ("eu", "fr")).collect()
    ]
    assert got == [("paris", 2), ("lyon", 1)]


def test_top_n_and_tiebreak(cats):
    got = [(r["child"], r["cnt"]) for r in taxonomy_children(cats, "cat", ("us",), top_n=1).collect()]
    # ca=2, ny=1
    assert got == [("ca", 2)]


def test_drill_down(cats):
    assert {r["doc_id"] for r in drill_down(cats, "cat", ("eu", "fr")).collect()} == {0, 1, 3}
    # prefix is component-wise: "eu" must not match "europa"
    extra = cats.sparkSession.createDataFrame([(9, "europa/x")], ["doc_id", "cat"])
    both = cats.unionByName(extra)
    assert {r["doc_id"] for r in drill_down(both, "cat", ("eu",)).collect()} == {
        0, 1, 2, 3, 6, 8,
    }


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark sharp share spoon"),
            (1, "spark spark share market"),
            (2, "market garden spark"),
            (3, "spoon garden sharp"),
        ],
        ["doc_id", "text"],
    )
    return InvertedIndex.build(docs, analyzer="simple", docs_per_segment=4)


def test_prefix_suggest(index):
    got = [(r["term"], r["weight"]) for r in prefix_suggest(index, "sp", n=10).collect()]
    # spark df=3, spoon df=2; weight desc then term asc
    assert got == [("spark", 3), ("spoon", 2)]


def test_infix_suggest(index):
    got = [(r["term"], r["weight"]) for r in infix_suggest(index, "ar", n=10).collect()]
    # market df=2, sharp df=2, spark df=3, garden df=2, share df=2
    assert got[0] == ("spark", 3)
    assert set(got[1:]) == {("garden", 2), ("market", 2), ("share", 2), ("sharp", 2)}
    terms = [t for t, _ in got[1:]]
    assert terms == sorted(terms)
