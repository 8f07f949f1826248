"""FuzzyLikeThisQuery analog: variant expansion, shared source idf,
avg-df fallback, unit-df scoring and the ConstantScore (ignoreTF)
mode. Reference semantics in
`sandbox/queries/FuzzyLikeThisQuery.java:55` (see module docstring).
"""

import math

import pandas as pd
import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search.fuzzylikethis import (
    fuzzy_like_this_topk,
    fuzzy_like_this_variants,
)

DOCS = [
    "merge sort merge",      # 0
    "merge join",            # 1
    "marge simpson",         # 2: marge = 1 edit from merge
    "jon snow",              # 3
    "join scan",             # 4
    "sort scan",             # 5
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    )
    return InvertedIndex.build(df, analyzer="simple", docs_per_segment=8)


def test_variants_share_source_idf(idx):
    got = fuzzy_like_this_variants(idx, ["merge"], max_edits=1)
    by_term = {t: (s, sc) for t, s, sc in got}
    assert set(by_term) == {"merge", "marge"}
    n = idx.doc_count
    idf = math.log((n + 1.0) / (2 + 1.0)) + 1.0  # df(merge)=2 for BOTH
    assert by_term["merge"][1] == pytest.approx(1.0 * idf)
    # marge: ed=1, sim = 1 - 1/5 = 0.8 -> 0.64 * idf of the SOURCE
    assert by_term["marge"][1] == pytest.approx(0.64 * idf)


def test_absent_source_uses_avg_variant_df(idx):
    # "joni" is NOT indexed; variants: jon (delete, df 1) and join
    # (transposition, df 2) -> df fallback = (1+2)//2 = 1, shared
    got = fuzzy_like_this_variants(idx, ["joni"], max_edits=1)
    by_term = {t: sc for t, _, sc in got}
    assert set(by_term) == {"jon", "join"}
    n = idx.doc_count
    idf = math.log((n + 1.0) / (1 + 1.0)) + 1.0
    sim_jon = 1.0 - 1.0 / 3.0   # min(len)=3
    sim_join = 1.0 - 1.0 / 4.0  # min(len)=4
    assert by_term["jon"] == pytest.approx(sim_jon * sim_jon * idf)
    assert by_term["join"] == pytest.approx(sim_join * sim_join * idf)


def test_max_num_terms_cap_and_order(idx):
    got = fuzzy_like_this_variants(idx, ["merge", "jon"], max_num_terms=2)
    assert len(got) == 2
    scores = [sc for _, _, sc in got]
    assert scores == sorted(scores, reverse=True)


def test_topk_prefers_tf_and_short_docs(idx):
    rows = fuzzy_like_this_topk(idx, ["merge"], k=3).collect()
    # doc 0 has merge twice -> sqrt(2) factor beats doc 1's single hit
    assert rows[0]["doc_id"] == 0
    assert {r["doc_id"] for r in rows} == {0, 1, 2}


def test_ignore_tf_constant_score(idx):
    rows = fuzzy_like_this_topk(idx, ["merge"], k=3, ignore_tf=True).collect()
    scores = {r["doc_id"]: r["score"] for r in rows}
    # ConstantScore mode: docs 0 and 1 both match only 'merge' -> equal
    assert scores[0] == scores[1]


def test_prefix_length_gate(idx):
    got = fuzzy_like_this_variants(idx, ["jorge"], max_edits=2, prefix_length=1)
    # marge/merge are 2 edits away but fail the 'j' prefix requirement
    assert all(t.startswith("j") for t, _, _ in got)
