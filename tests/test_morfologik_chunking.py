"""Morfologik dictionary-lemmatizer analog (MorfologikFilter.java:51)
and the sentence-window chunking op (pipeline/chunking.py)."""

import pytest

from lucene_spark.analysis.morfologik import (
    POLISH_DICT,
    morfologik_analyze,
    morfologik_lookup,
)


# ---------------------------------------------------------- morfologik


def test_ambiguous_form_emits_all_interpretations():
    hits = morfologik_lookup("mamy")
    assert [h[0] for h in hits] == ["mieć", "mama"]


def test_lowercase_fallback():
    # MorfologikFilter.java:128: exact lookup first, then lowercased
    assert morfologik_lookup("Mamy") == morfologik_lookup("mamy")


def test_unknown_returns_none():
    assert morfologik_lookup("xyzzy") is None


def test_tag_splitter_plus_and_pipe():
    # MorfologikFilter.java:76 lemmaSplitter splits on '+' or '|'
    hits = morfologik_lookup("studenta")
    assert hits[0][1] == ["subst:sg:gen:m1", "subst:sg:acc:m1"]
    hits = morfologik_lookup(
        "w1", {"w1": [("l1", "a|b+c")]}
    )
    assert hits[0][1] == ["a", "b", "c"]


def test_analyze_same_position_stacking():
    rows = morfologik_analyze("mamy kota")
    # both interpretations of "mamy" share position 0 (posIncrement 0)
    assert [(p, l) for p, l, _ in rows if p == 0] == [(0, "mieć"), (0, "mama")]


def test_analyze_unknown_passthrough_with_cleared_tags():
    rows = morfologik_analyze("qqq")
    assert rows == [(0, "qqq", [])]


def test_keyword_skips_lookup():
    rows = morfologik_analyze("mamy", keywords=frozenset({"mamy"}))
    assert rows == [(0, "mamy", [])]


def test_custom_dictionary():
    d = {"aaa": [("bbb", "t1")]}
    assert morfologik_lookup("aaa", d) == [("bbb", ["t1"])]
    assert morfologik_lookup("mamy", d) is None


def test_shipped_dict_is_ambiguity_rich():
    ambiguous = [w for w, v in POLISH_DICT.items() if len(v) > 1]
    assert len(ambiguous) >= 5


# ---------------------------------------------------------- chunking


def _windows_local(n_sents, w, s):
    """Reference windowing: window k covers sentences [k*s, k*s+w)."""
    out = {}
    k = 0
    while k * s < n_sents:
        sents = [i for i in range(k * s, min(k * s + w, n_sents))]
        if sents:
            out[k] = sents
        k += 1
    return out


def test_sentence_windows_membership(spark):
    from lucene_spark.pipeline.chunking import sentence_windows

    text = "A one. B two. C three. D four. E five."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {
        r["chunk_id"]: (r["chunk_text"], r["n_sentences"], r["first_sentence"])
        for r in sentence_windows(df, window=3, stride=2).collect()
    }
    expected = _windows_local(5, 3, 2)
    assert set(rows) == set(expected)
    sents = ["A one.", "B two.", "C three.", "D four.", "E five."]
    for k, idxs in expected.items():
        assert rows[k][0] == " ".join(sents[i] for i in idxs)
        assert rows[k][1] == len(idxs)
        assert rows[k][2] == idxs[0]


def test_sentence_windows_single_sentence(spark):
    from lucene_spark.pipeline.chunking import sentence_windows

    df = spark.createDataFrame([(7, "Only one here.")], "doc_id long, text string")
    rows = sentence_windows(df, window=3, stride=2).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_id"] == 0 and rows[0]["n_sentences"] == 1


def test_sentence_windows_validates_args(spark):
    from lucene_spark.pipeline.chunking import sentence_windows

    df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sentence_windows(df, window=0)


# ---------------------------------------------------------- histogram


def test_histogram_floor_div_negative(spark):
    from lucene_spark.search.facets import histogram_counts

    df = spark.createDataFrame(
        [(-25,), (-1,), (0,), (9,), (10,), (25,)], "v long"
    )
    rows = {r["bucket"]: r["cnt"] for r in histogram_counts(df, "v", 10).collect()}
    # Java Math.floorDiv: -25/10 -> -3, -1/10 -> -1
    assert rows == {-3: 1, -1: 1, 0: 2, 1: 1, 2: 1}


def test_histogram_max_buckets_cap(spark):
    import pytest as _pytest

    from lucene_spark.search.facets import histogram_counts

    df = spark.createDataFrame([(i * 100,) for i in range(10)], "v long")
    with _pytest.raises(ValueError, match="maxBuckets"):
        histogram_counts(df, "v", 10, max_buckets=5)


def test_histogram_nulls_skipped(spark):
    from lucene_spark.search.facets import histogram_counts

    df = spark.createDataFrame([(1,), (None,), (11,)], "v long")
    rows = histogram_counts(df, "v", 10).collect()
    assert sum(r["cnt"] for r in rows) == 2
