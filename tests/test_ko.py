"""Korean morphological tokenizer (nori analog): pinned segmentation
goldens, DecompoundMode none/discard/mixed, unknown-word class
handling, Arrow UDF parity. Reference behaviors:
`analysis/nori/.../ko/KoreanTokenizer.java:67` (lattice Viterbi),
`KoreanTokenizer.DecompoundMode` (compound handling)."""

import pandas as pd
import pytest

from lucene_spark.analysis.ko import (
    ko_analyze,
    ko_tokenize,
    ko_tokenize_detail,
    ko_tokens_udf,
)

GOLDEN_DISCARD = [
    ("삼성전자는 한국 기업이다", ["삼성", "전자", "는", "한국", "기업", "이", "다"]),
    ("서울대학교에 갔다", ["서울", "대학교", "에", "갔", "다"]),
    ("검색엔진을 개발했다", ["검색", "엔진", "을", "개발", "했", "다"]),
    ("데이터시스템 성능 평가", ["데이터", "시스템", "성능", "평가"]),
    ("AI 기술은 세계를 바꾼다", ["AI", "기술", "은", "세계", "를", "바꾼", "다"]),
    ("선생님께서는 책을 읽었다",
     ["선생", "님", "께서", "는", "책", "을", "읽", "었", "다"]),
    ("형태소분석 결과입니다", ["형태소", "분석", "결과", "입니다"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN_DISCARD)
def test_golden_discard(text, expected):
    assert ko_tokenize(text) == expected


def test_decompound_modes():
    assert ko_tokenize("삼성전자는", decompound="none") == ["삼성전자", "는"]
    assert ko_tokenize("삼성전자는", decompound="discard") == ["삼성", "전자", "는"]
    assert ko_tokenize("삼성전자는", decompound="mixed") == [
        "삼성전자", "삼성", "전자", "는",
    ]
    with pytest.raises(ValueError):
        ko_tokenize("x", decompound="bogus")


def test_mixed_overlay_positions():
    detail = ko_tokenize_detail("삼성전자", "mixed")
    # compound overlays its parts: same start, posLength = #parts
    assert detail[0] == ("삼성전자", 0, 4, "NNP", 2)
    assert detail[1][:3] == ("삼성", 0, 2) and detail[2][:3] == ("전자", 2, 4)


def test_offsets_cover_text():
    text = "서울대학교에 갔다"
    detail = ko_tokenize_detail(text, "discard")
    for surf, start, end, _pos, _pl in detail:
        assert text[start:end] == surf


def test_unknown_runs_group():
    # latin/digit runs group (SL/SN); unknown hangul falls back to
    # single syllables rather than swallowing the dictionary parse
    assert ko_tokenize("GPU 2024 데이터") == ["GPU", "2024", "데이터"]
    toks = ko_tokenize("즑겛 한국")  # nonsense syllables stay separate
    assert "한국" in toks and all(len(t) == 1 for t in toks if t != "한국")


def test_punctuation_discard_flag():
    assert ko_tokenize("한국, 서울!") == ["한국", "서울"]
    assert ko_tokenize("한국, 서울!", discard_punctuation=False) == [
        "한국", ",", "서울", "!",
    ]


def test_analyze_lowercases():
    assert ("ai", 0) in ko_analyze("AI 기술")


def test_udf_matches_local(spark):
    texts = [t for t, _ in GOLDEN_DISCARD]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [r["toks"] for r in
           df.select(ko_tokens_udf("discard")("text").alias("toks")).collect()]
    assert got == [ko_tokenize(t) for t in texts]
