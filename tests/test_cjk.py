"""CJK analysis chain (`analysis/cjk/CJKAnalyzer.java`,
`CJKBigramFilter.java`, `CJKWidthCharFilter.java`) — goldens from the
reference's TestCJKAnalyzer / TestCJKWidthFilter."""

import pandas as pd
import pytest

from lucene_spark.analysis.cjk import (
    CJK_STOP_WORDS,
    cjk_analyze,
    cjk_bigram_tokens,
    cjk_width_fold,
)
from lucene_spark.analysis.uax29 import uax29_tokenize_spans


def _terms(text):
    return [t for t, _ in cjk_analyze(text)]


@pytest.mark.parametrize(
    "text,want",
    [
        # TestCJKAnalyzer.java:52-91 goldens
        ("一二三四五六七八九十",
         ["一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九", "九十"]),
        ("一 二三四 五六七八九 十",
         ["一", "二三", "三四", "五六", "六七", "七八", "八九", "十"]),
        ("abc defgh ijklmn opqrstu vwxy z",
         ["abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z"]),
        ("あい", ["あい"]),
        ("あい   ", ["あい"]),
        ("test", ["test"]),
        ("あいtest", ["あい", "test"]),
        ("testあい    ", ["test", "あい"]),
        ("一", ["一"]),
        # mixed-script chaining (katakana run + han, contiguous offsets)
        ("忠犬ハチ公", ["忠犬", "犬ハ", "ハチ", "チ公"]),
        # hangul words bigram too
        ("한국어", ["한국", "국어"]),
    ],
)
def test_cjk_analyzer_goldens(text, want):
    assert _terms(text) == want


def test_stopwords_removed_positions_kept():
    out = cjk_analyze("the 東京 of test")
    assert out == [("東京", 1), ("test", 3)]
    assert "the" in CJK_STOP_WORDS and "of" in CJK_STOP_WORDS


def test_width_fold():
    # TestCJKWidthFilter: halfwidth kana + voiced mark composition
    assert cjk_width_fold("ﾊﾞｲｸ") == "バイク"
    assert cjk_width_fold("Ｔｅｓｔ　１２３４") == "Test 1234"
    assert cjk_width_fold("ｶﾀｶﾅ") == "カタカナ"
    assert cjk_width_fold("ﾋﾟｬ") == "ピャ"


def test_output_unigrams_interleave():
    spans = uax29_tokenize_spans("一二三")
    got = cjk_bigram_tokens(spans, output_unigrams=True)
    # A, AB(stacked), B, BC(stacked), C — bigram at its first char's pos
    assert got == [("一", 0), ("一二", 0), ("二", 1), ("二三", 1), ("三", 2)]


def test_build_and_search_cjk(spark):
    from lucene_spark.index import InvertedIndex
    from lucene_spark.search import IndexSearcher, TermQuery

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["東京タワー", "東京 観光", "大阪タワー"],
        }
    )
    idx = InvertedIndex.build(
        spark.createDataFrame(pdf), analyzer=cjk_analyze, docs_per_segment=4
    )
    hits = {
        r["doc_id"]
        for r in IndexSearcher(idx).search(TermQuery("東京"), k=10).collect()
    }
    assert hits == {0, 1}
    # bigram crossing the script boundary only where offsets touch
    tower = {
        r["doc_id"]
        for r in IndexSearcher(idx).search(TermQuery("京タ"), k=10).collect()
    }
    assert tower == {0}


def test_width_fold_does_not_normalize_unrelated_text():
    """Composition touches only the kana+voiced-mark pairs the fold
    produced; pre-decomposed Latin stays byte-identical whether or not
    halfwidth kana is present (review finding)."""
    decomposed = "cafe\u0301"  # e + combining acute, NOT U+00E9
    assert cjk_width_fold(decomposed) == decomposed
    assert cjk_width_fold(decomposed + " \uff8a\uff9e") == decomposed + " \u30d0"
