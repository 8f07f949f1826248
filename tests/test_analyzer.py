"""Analysis-chain goldens (FIXTURES.md F4).

Expectations pinned from documented Lucene behavior:
- StandardTokenizer UAX#29 word tokens with MidLetter/MidNum joins
  (`analysis/standard/StandardTokenizer.java:38-113`), 255-char split
  (`:152-168`), per-char IDEOGRAPHIC/HIRAGANA, KATAKANA runs;
- per-codepoint simple lowercase (`analysis/CharacterUtils.java:53-60`);
- 33-word English stopset with position-increment preservation
  (`en/EnglishAnalyzer.java:48-50`, `FilteringTokenFilter.java:49-75`).
"""

import pandas as pd
from pyspark.sql import functions as F

from lucene_spark.analysis import (
    ENGLISH_STOP_WORDS,
    analyze,
    extract_text_col,
    simple_lowercase,
    standard_analyzer_udf,
    tokenize,
)


def test_stopset_is_lucene_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert "fox" not in ENGLISH_STOP_WORDS


def test_basic_word_break():
    assert tokenize("Hello, World! foo-bar") == ["Hello", "World", "foo", "bar"]


def test_mid_letter_and_mid_num_joins():
    # UAX#29 WB6/WB7 (MidLetter/MidNumLet) and WB11/WB12 (MidNum)
    assert tokenize("can't o'clock a.b") == ["can't", "o'clock", "a.b"]
    assert tokenize("3.14 1,000 2.5.6") == ["3.14", "1,000", "2.5.6"]
    # separators not surrounded by the right class split
    assert tokenize("a, b .5 x.") == ["a", "b", "5", "x"]


def test_extend_num_let_underscore_joins():
    assert tokenize("foo_bar x_1") == ["foo_bar", "x_1"]


def test_cjk_per_char_and_kana_runs():
    assert tokenize("漢字です") == ["漢", "字", "で", "す"]
    assert tokenize("カタカナtest") == ["カタカナ", "test"]
    assert tokenize("한국어") == ["한국어"]


def test_max_token_length_splits_not_drops():
    t = "x" * 600
    toks = tokenize(t)
    assert [len(x) for x in toks] == [255, 255, 90]
    assert "".join(toks) == t


def test_simple_lowercase_vs_full_casing():
    # U+0130 full-maps to 'i̇' but simple-maps to 'i' (Java semantics)
    assert simple_lowercase("İ") == "i"
    # sharp s is already lowercase; capital sharp S simple-maps to ß
    assert simple_lowercase("ẞß") == "ßß"
    # sigma: simple mapping is always σ (no final-sigma context rule)
    assert simple_lowercase("ΣΑΣ") == "σασ"
    assert simple_lowercase("ABCdef123") == "abcdef123"


def test_stop_filter_preserves_positions():
    out = analyze("The quick and the dead")
    # positions 0..4; 'the'(0), 'and'(2), 'the'(3) dropped
    assert out == [("quick", 1), ("dead", 4)]


def test_norm_length_counts_surviving_tokens():
    # norm length = len(analyze(...)) — stop words excluded
    out = analyze("the the the fox")
    assert len(out) == 1


def test_analyzer_udf_matches_python(spark):
    texts = [
        "The QUICK brown fox",
        "can't stop 3.14",
        "漢字 カタカナ",
        "",
        "İstanbul o'clock",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    res = df.select(standard_analyzer_udf()(F.col("text")).alias("toks")).collect()
    for text, row in zip(texts, res):
        got = [(t["term"], t["pos"]) for t in row["toks"]]
        assert got == analyze(text), text


def test_extract_text_byte_identity(spark):
    texts = ["plain text", "ünïcode ✓ 漢", ""]
    pdf = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(len(texts))],
            "html": [f"<html><body>{t}</body></html>".encode() for t in texts],
            "text": texts,
        }
    )
    df = spark.createDataFrame(pdf)
    rows = df.select("text", extract_text_col(F.col("html")).alias("ext")).collect()
    for r in rows:
        assert r["ext"] == r["text"]  # byte-identical per url (input_hint)


def test_term_freqs_matches_analyze():
    """The C-level hot path must agree with the reference chain."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from lucene_spark.analysis import analyze, term_freqs

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=400))
    def check(text):
        ref = analyze(text)
        cnt, dl = term_freqs(text)
        assert cnt == Counter(t for t, _ in ref)
        assert dl == len(ref)

    check()

    # targeted cases: stopwords, overlong token split, unicode, CJK
    for text in [
        "the a an and are",
        "x" * 600 + " the quick",
        "İstanbul Zürich naïve 東京タワー 검색",
        "can't o'clock 3.14 1,000 a_b",
        "",
        "   ",
    ]:
        ref = analyze(text)
        cnt, dl = term_freqs(text)
        assert cnt == Counter(t for t, _ in ref), text
        assert dl == len(ref), text


def test_lowercase_hoist_preserves_boundaries():
    """analyze() lowercases before tokenizing; verify against the
    reference order (tokenize, then lowercase each token)."""
    from hypothesis import given, settings, strategies as st

    from lucene_spark.analysis import ENGLISH_STOP_WORDS, analyze, simple_lowercase, tokenize

    def reference(text):
        out = []
        for pos, tok in enumerate(tokenize(text)):
            term = simple_lowercase(tok)
            if term not in ENGLISH_STOP_WORDS:
                out.append((term, pos))
        return out

    @settings(max_examples=400, deadline=None)
    @given(st.text(max_size=300))
    def check(text):
        assert analyze(text) == reference(text)

    check()

    for text in [
        "The QUICK İstanbul STRASSE ẞ Ω µ",
        "CAN'T O'CLOCK A.B.C 3.14 1,000",
        "東京タワーＡＢＣ ＫＡＴＡ",
        "x" * 300 + "Y" * 300,
    ]:
        assert analyze(text) == reference(text), text
