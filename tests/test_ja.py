"""Japanese morphological tokenizer (kuromoji analog): reference
fixture segmentation, offsets, search-mode decompounding, unknown-word
script grouping, and the recall/size differential vs CJK bigrams."""

import pytest

from lucene_spark.analysis.ja import (
    ja_analyze,
    ja_search_analyze,
    ja_tokenize,
    ja_tokenize_detail,
)

# TestJapaneseTokenizer basic segmentation fixtures
FIXTURES = [
    ("これは本ではない", ["これ", "は", "本", "で", "は", "ない"]),
    ("関西国際空港に行った", ["関西", "国際", "空港", "に", "行っ", "た"]),
    ("数学部長谷川", ["数学", "部長", "谷川"]),
    ("成田空港、米原油流出", ["成田空港", "米", "原油", "流出"]),
    ("お寿司が食べたい。", ["お", "寿司", "が", "食べ", "たい"]),
    (
        "麻薬の密売は根こそぎ絶やさなければならない",
        ["麻薬", "の", "密売", "は", "根こそぎ", "絶やさ", "なけれ", "ば", "なら", "ない"],
    ),
]


@pytest.mark.parametrize("text,want", FIXTURES)
def test_reference_fixture_segmentation(text, want):
    assert ja_tokenize(text) == want


def test_katakana_run_groups_normal_mode():
    # JapaneseTokenizer NORMAL: no decomposition for compounds
    assert ja_tokenize("シニアソフトウェアエンジニア") == ["シニアソフトウェアエンジニア"]


def test_unknown_kanji_fall_back_per_char():
    # surrogate-pair kanji included (TestJapaneseTokenizer surrogates case)
    assert ja_tokenize("𩬅艱鍟䇹愯瀛") == ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]


def test_search_mode_decompounds_long_kanji():
    assert ja_tokenize("成田空港", mode="search") == ["成田", "空港"]
    assert ja_tokenize("成田空港", mode="normal") == ["成田空港"]


def test_mixed_latin_japanese():
    assert ja_tokenize("Lucene は Java の検索エンジン") == [
        "Lucene", "は", "Java", "の", "検索", "エンジン",
    ]


def test_offsets_cover_non_space_text():
    text = "お寿司が食べたい。今日は良い天気"
    detail = ja_tokenize_detail(text)
    # offsets are strictly increasing, non-overlapping, and every
    # non-space char is covered by exactly one token
    covered = []
    last_end = 0
    for surf, s, e, _pos in detail:
        assert text[s:e] == surf
        assert s >= last_end
        last_end = e
        covered.extend(range(s, e))
    non_space = [i for i, c in enumerate(text) if not c.isspace()]
    assert covered == non_space


def test_punctuation_discard_toggle():
    with_punct = ja_tokenize("お寿司が食べたい。", discard_punctuation=False)
    assert with_punct[-1] == "。"
    assert ja_tokenize("お寿司が食べたい。")[-1] == "たい"


def test_determinism():
    text = "麻薬の密売は根こそぎ絶やさなければならない"
    assert ja_tokenize(text) == ja_tokenize(text)


def test_analyze_positions_and_lowercase():
    toks = ja_analyze("Lucene は検索エンジン。")
    assert toks == [("lucene", 0), ("は", 1), ("検索", 2), ("エンジン", 3)]


def test_search_analyze_splits_compounds():
    terms = [t for t, _ in ja_search_analyze("成田空港に行った")]
    assert terms == ["成田", "空港", "に", "行っ", "た"]


def test_differential_vs_cjk_bigrams():
    """The bigram path is the recall-only fallback: every morph token of
    length >= 2 is reachable through the bigram index (all its bigrams
    exist), and the morph postings are strictly fewer per document."""
    from lucene_spark.analysis.cjk import cjk_analyze

    corpus = [
        "関西国際空港に行った",
        "成田空港、米原油流出",
        "大学院の研究は形態素解析の評価実験",
    ]
    for text in corpus:
        morph = [t for t, _ in ja_analyze(text)]
        bigram_terms = {t for t, _ in cjk_analyze(text)}
        for tok in morph:
            if len(tok) >= 2 and all("一" <= c <= "鿿" for c in tok):
                grams = {tok[i : i + 2] for i in range(len(tok) - 1)}
                assert grams <= bigram_terms, (tok, grams - bigram_terms)
        # morph emits fewer tokens than the stacked bigram expansion
        assert len(morph) < len(list(cjk_analyze(text)))


def test_empty_and_space_only():
    assert ja_tokenize("") == []
    assert ja_tokenize("   ") == []
