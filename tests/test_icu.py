"""ICUFoldingFilter / ICUNormalizer2Filter analogs
(`analysis/icu/.../ICUFoldingFilter.java:64`, `ICUNormalizer2Filter.java:52`).

Goldens derive from the published UTR#30 folding set + the Unicode
character database (the same data ICU's utr30.nrm is compiled from).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.analysis.icu import (
    icu_analyzer,
    icu_fold_str,
    icu_fold_tokens_udf,
    icu_normalize_str,
)

GOLDENS = [
    # accents stripped + case folded
    ("Résumé", "resume"),
    ("naïve", "naive"),
    ("Café", "cafe"),
    ("ZÜRICH", "zurich"),
    ("Ångström", "angstrom"),
    # ligature / compatibility foldings (NFKC)
    ("ﬁnance", "finance"),
    ("ﬂow", "flow"),
    ("Ĳs", "ijs"),
    ("Ⅻ", "xii"),
    # width folding
    ("ＦＵＬＬ", "full"),
    ("ｅｘａｍｐｌｅ", "example"),
    # full case folding expansions
    ("straße", "strasse"),
    ("İstanbul", "istanbul"),
    # Greek: final sigma folds to sigma, tonos stripped
    ("Σίσυφος", "σισυφοσ"),
    # pass-through: CJK, emoji, plain ASCII
    ("東京", "東京"),
    ("🚀", "🚀"),
    ("already_lower", "already_lower"),
]


@pytest.mark.parametrize("src,want", GOLDENS)
def test_fold_goldens(src, want):
    assert icu_fold_str(src) == want


def test_fold_idempotent():
    for src, want in GOLDENS:
        assert icu_fold_str(want) == want


def test_normalizer_forms():
    # NFC composes, NFKC folds compatibility, nfkc_cf also case folds
    decomposed = "é"  # e + combining acute
    assert icu_normalize_str(decomposed, "nfc") == "é"
    assert icu_normalize_str("ﬁ", "nfkc") == "fi"
    assert icu_normalize_str("Straße ＦＵＬＬ", "nfkc_cf") == "strasse full"
    with pytest.raises(ValueError):
        icu_normalize_str("x", "nfd")


def test_fold_tokens_udf(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, ["Résumé", "ﬁnance", "ＦＵＬＬ", "東京"]), (1, None)],
        "id long, toks array<string>",
    )
    rows = {
        r["id"]: r["folded"]
        for r in df.select(
            "id", icu_fold_tokens_udf()(F.col("toks")).alias("folded")
        ).collect()
    }
    assert rows[0] == ["resume", "finance", "full", "東京"]
    assert rows[1] is None


def test_icu_analyzer_chain(spark):
    """End-to-end: index built with the ICU analyzer matches folded
    terms regardless of source accents/width/case."""
    from lucene_spark.index import InvertedIndex
    from lucene_spark.search import IndexSearcher, TermQuery

    docs = spark.createDataFrame(
        [
            (0, "Résumé writing at the Café"),
            (1, "my resume and her RÉSUMÉ too"),
            (2, "ＲＥＳＵＭＥ in fullwidth"),
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    idx = InvertedIndex.build(
        docs, analyzer=icu_analyzer(), docs_per_segment=4, positions=True
    )
    s = IndexSearcher(idx)
    got = {r["doc_id"] for r in s.search(TermQuery("resume"), 10).collect()}
    assert got == {0, 1, 2}


def test_stopwords_after_fold():
    an = icu_analyzer(stopwords=frozenset({"the"}))
    # 'The' folds to 'the' then drops; positions keep ordinals
    assert an("The Résumé") == [("resume", 1)]
