"""StringDistance family vs the reference's own test values
(TestJaroWinklerDistance / TestNGramDistance / TestLevenshtein /
TestLuceneLevenshtein shapes)."""

import pytest

from lucene_spark.search.stringdist import (
    high_frequency_dictionary,
    jaro_winkler_similarity,
    levenshtein_similarity,
    lucene_levenshtein_similarity,
    ngram_similarity,
    string_distance_udf,
)


def test_jaro_winkler_goldens():
    assert jaro_winkler_similarity("al", "al") == 1.0
    d = jaro_winkler_similarity("martha", "marhta")
    assert 0.961 < d < 0.962
    d = jaro_winkler_similarity("dwayne", "duane")
    assert 0.84 < d < 0.85
    d = jaro_winkler_similarity("dixon", "dicksonx")
    assert 0.81 < d < 0.82
    assert jaro_winkler_similarity("fvie", "ten") == 0.0


def test_levenshtein():
    assert levenshtein_similarity("al", "al") == 1.0
    # lucene: 1 - edits/max(len)
    assert levenshtein_similarity("martha", "marhta") == pytest.approx(1 - 2 / 6)
    assert levenshtein_similarity("", "") == 1.0
    assert levenshtein_similarity("", "al") == 0.0


def test_lucene_levenshtein_quirks():
    # transposition counts ONE edit; normalization is by MIN length
    assert lucene_levenshtein_similarity("martha", "marhta") == pytest.approx(
        1 - 1 / 6
    )
    # can go negative: 'ab' -> 'cde' distance 3, min len 2
    assert lucene_levenshtein_similarity("ab", "cde") == pytest.approx(-0.5)
    # the reference's empty-string branch returns RAW distances
    assert lucene_levenshtein_similarity("", "") == 0.0
    assert lucene_levenshtein_similarity("", "abc") == 3.0


def test_ngram_goldens():
    for n in (1, 2, 3):
        assert ngram_similarity("al", "al", n) == pytest.approx(1.0, abs=1e-3)
        assert ngram_similarity("a", "a", n) == pytest.approx(1.0, abs=1e-3)
    # short-string path: positional char agreement / max len
    assert ngram_similarity("a", "ab", 2) == pytest.approx(0.5, abs=1e-3)
    assert ngram_similarity("", "al", 1) == 0.0
    assert ngram_similarity("", "", 2) == 1.0
    # bigram distance distinguishes transposed middles
    d = ngram_similarity("martha", "marhta", 2)
    assert 0.0 < d < 1.0


def test_udf_and_unknown_kind(spark):
    df = spark.createDataFrame(
        [("martha", "marhta"), ("al", "al")], "a string, b string"
    )
    rows = df.select(string_distance_udf("jaro_winkler")("a", "b").alias("d")).collect()
    assert 0.961 < rows[0]["d"] < 0.962 and rows[1]["d"] == 1.0
    with pytest.raises(ValueError):
        string_distance_udf("cosine")


def test_high_frequency_dictionary(spark):
    from lucene_spark.index import InvertedIndex

    rows = [(i, "common word" + (" rare" if i == 0 else "")) for i in range(10)]
    idx = InvertedIndex.build(
        spark.createDataFrame(rows, "doc_id long, text string"),
        analyzer="simple",
        docs_per_segment=4,
    )
    terms = [r["term"] for r in high_frequency_dictionary(idx, 0.5).collect()]
    assert terms == ["common", "word"]
    # threshold 0 admits everything
    assert len(high_frequency_dictionary(idx, 0.0).collect()) == 3


# ------------------------------------------------ classic SpellChecker


def test_spell_checker_suggest(spark):
    from lucene_spark.search.spellcheck import spell_checker_suggest

    words = ["hash", "harsh", "hush", "mash", "join", "merge", "stash", "has"]
    d = spark.createDataFrame(
        [(w, i + 1) for i, w in enumerate(words)], "term string, freq long"
    )
    rows = spell_checker_suggest(d, "hsah", num_sug=5, freq_col="freq").collect()
    got = [(r["term"], r["sim"]) for r in rows]
    # plain Levenshtein: transposition costs 2 -> hash/hush/has all 0.5;
    # SuggestWordScoreComparator ties break by freq desc then term asc
    assert got == [("has", 0.5), ("hush", 0.5), ("hash", 0.5)]
    # the word itself is never suggested
    assert all(t != "hsah" for t, _ in got)


def test_spell_checker_accuracy_floor(spark):
    from lucene_spark.search.spellcheck import spell_checker_suggest

    d = spark.createDataFrame([("hash", 1)], "term string, freq long")
    assert (
        spell_checker_suggest(d, "hsah", accuracy=0.75, freq_col="freq").count()
        == 0
    )
    assert (
        spell_checker_suggest(d, "hsah", accuracy=0.5, freq_col="freq").count()
        == 1
    )


def test_spell_checker_gram_sizes():
    from lucene_spark.search.spellcheck import _gram_sizes

    assert _gram_sizes(8) == (3, 4)
    assert _gram_sizes(5) == (2, 3)
    assert _gram_sizes(4) == (1, 2)
    assert _gram_sizes(1) == (1, 1)


def test_spell_checker_suggest_modes(spark):
    from lucene_spark.search.spellcheck import spell_checker_suggest

    d = spark.createDataFrame(
        [("hash", 10), ("hsah", 2), ("hush", 1)], "term string, freq long"
    )
    # word present in the dictionary -> when_not_in_index suggests nothing
    assert (
        spell_checker_suggest(
            d, "hsah", freq_col="freq", suggest_mode="when_not_in_index"
        ).count()
        == 0
    )
    # more_popular keeps only candidates with freq > the word's own (2)
    rows = spell_checker_suggest(
        d, "hsah", freq_col="freq", suggest_mode="more_popular"
    ).collect()
    assert [r["term"] for r in rows] == ["hash"]
    import pytest

    with pytest.raises(ValueError):
        spell_checker_suggest(d, "x", suggest_mode="sometimes")
    with pytest.raises(ValueError):
        spell_checker_suggest(d, "x", suggest_mode="more_popular")  # no freq_col
