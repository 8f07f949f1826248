"""Chinese HHMM segmentation (SmartChineseAnalyzer analog): golden
segmentations, char-class grouping, SegTokenFilter normalization,
Viterbi cost sanity, and the analyzer chain."""

import math

import pytest

from lucene_spark.analysis.zh import (
    _edge_cost,
    zh_analyze,
    zh_tokenize,
    zh_tokenize_detail,
)

# pinned golden segmentations (hand-verified; shared with the
# zh_smart_tokens driver gate)
FIXTURES = [
    ("我购买了道具和服装。", ["我", "购买", "了", "道具", "和", "服装"]),
    ("我是中国人", ["我", "是", "中国人"]),
    ("北京大学的学生在图书馆学习", ["北京大学", "的", "学生", "在", "图书馆", "学习"]),
    ("今天天气很好", ["今天", "天气", "很好"]),
    ("中文分词是自然语言处理的基础", ["中文", "分词", "是", "自然语言", "处理", "的", "基础"]),
    ("他们在上海的公司开发搜索引擎", ["他们", "在", "上海", "的", "公司", "开发", "搜索引擎"]),
    ("我们明天去北京大学", ["我们", "明天", "去", "北京大学"]),
]


@pytest.mark.parametrize("text,want", FIXTURES)
def test_golden_segmentation(text, want):
    assert zh_tokenize(text) == want


def test_letter_and_digit_runs_group():
    # HHMMSegmenter LETTER/DIGIT cases: runs become one token each
    assert zh_tokenize("我有2台iPhone手机") == ["我", "有", "2", "台", "iphone", "手机"]
    assert zh_tokenize("hello world 123") == ["hello", "world", "123"]


def test_fullwidth_folds_to_halfwidth():
    # SegTokenFilter: fullwidth digits/letters -> ASCII, lowercased
    assert zh_tokenize("１２３４ＡＢＣ测试") == ["1234", "abc", "测试"]


def test_unknown_hanzi_fall_back_per_char():
    toks = zh_tokenize("鑫垚犇")
    assert toks == ["鑫", "垚", "犇"]


def test_punctuation_dropped_unless_kept():
    assert zh_tokenize("你好，世界！") == ["你", "好", "世界"]
    assert "，" in zh_tokenize("你好，世界！", keep_punct=True)


def test_empty_and_space_only():
    assert zh_tokenize("") == []
    assert zh_tokenize("   ") == []
    assert zh_tokenize_detail("") == []


def test_offsets_cover_non_space_text():
    text = "今天天气很好, we go 北京"
    detail = zh_tokenize_detail(text)
    last_end = 0
    for _, _, s, e in detail:
        assert s >= last_end and e > s
        last_end = e
    covered = set()
    for _, _, s, e in detail:
        covered.update(range(s, e))
    for i, ch in enumerate(text):
        if not ch.isspace():
            assert i in covered


def test_analyze_chain_stops_and_stems():
    # delimiters + stopset out, latin tokens porter-stemmed
    toks = zh_analyze("我购买了道具和服装。 Testing stemming")
    assert toks == ["我", "购买", "道具", "服装", "test", "stem"]


def test_edge_cost_monotone_in_frequency():
    # BiSegGraph smoothing: higher previous-word frequency -> lower cost;
    # a seen bigram lowers cost further
    assert _edge_cost(10000, 0) < _edge_cost(0, 0)
    assert _edge_cost(100, 500) < _edge_cost(100, 0)
    assert math.isfinite(_edge_cost(0, 0))


def test_dictionary_word_beats_single_chars():
    # 图书馆 (in lexicon) must not split into 图书/馆 or 图/书/馆
    assert zh_tokenize("图书馆") == ["图书馆"]
    # longest-match is NOT hardcoded: 中国人 wins by path cost, and a
    # context where the trigram is absent still segments sensibly
    assert zh_tokenize("中国人") == ["中国人"]
