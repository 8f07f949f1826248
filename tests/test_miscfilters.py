"""Misc token filters vs reference unit-test vectors
(TestHyphenatedWordsFilter, TestPatternCaptureGroupTokenFilter,
TestCapitalizationFilter, TestPatternReplaceFilter, etc.)."""

import pytest

from lucene_spark.analysis.miscfilters import (
    capitalize_token,
    delimited_term_frequency,
    hyphenated_words,
    keep_types,
    keep_word_tokens,
    limit_token_count,
    pattern_capture_tokens,
    pattern_replace,
    remove_duplicate_tokens,
    stemmer_override,
    truncate_token,
)


def test_hyphenated_words():
    # TestHyphenatedWordsFilter.java:37-61
    toks = (
        "ecologi- cal develop- ment comprehensive-hands-on and "
        "ecologi- cal".split()
    )
    assert hyphenated_words(toks) == [
        "ecological", "development", "comprehensive-hands-on", "and",
        "ecological",
    ]
    toks2 = (
        "ecologi- cal develop- ment comprehensive-hands-on and "
        "ecology-".split()
    )
    assert hyphenated_words(toks2)[-1] == "ecology-"
    assert hyphenated_words(["abcd-", "ef", "geh", "12345678-"]) == [
        "abcdef", "geh", "12345678-"
    ]
    assert hyphenated_words([]) == []


CAPTURE_VECTORS = [
    ("foobarbaz", [], False, ["foobarbaz"]),
    ("foobarbaz", [], True, ["foobarbaz"]),
    ("foobarbaz", ["xx"], False, ["foobarbaz"]),
    ("foobarbaz", ["xx"], True, ["foobarbaz"]),
    ("foobarbaz", [".."], False, ["foobarbaz"]),
    ("foobarbaz", [".(y*)"], False, ["foobarbaz"]),
    ("foobarbaz", ["(.+)"], False, ["foobarbaz"]),
    ("foobarbaz", ["(.+)"], True, ["foobarbaz"]),
    ("foobarbaz", ["^(.)"], False, ["f"]),
    ("foobarbaz", ["^(.)"], True, ["foobarbaz", "f"]),
    ("foobarbaz", ["^.(.)."], False, ["o"]),
    ("foobarbaz", ["^.(.)."], True, ["foobarbaz", "o"]),
    # repeated finds of one pattern emit in match order
    ("fooBarBaz", ["([A-Z][a-z]+)"], False, ["Bar", "Baz"]),
    ("fooBarBaz", ["([A-Z][a-z]+)"], True, ["fooBarBaz", "Bar", "Baz"]),
    # two patterns merge by capture start offset
    ("fooBarBaz", ["^([a-z]+)", "([A-Z][a-z]+)"], False,
     ["foo", "Bar", "Baz"]),
]


@pytest.mark.parametrize("tok,pats,pres,want", CAPTURE_VECTORS)
def test_pattern_capture(tok, pats, pres, want):
    assert pattern_capture_tokens(tok, pats, pres) == want


def test_capitalization():
    # TestCapitalizationFilter.java:40-110 (onlyFirstWord, keep,
    # forceFirstLetter)
    keep = ["and", "the", "it", "BIG"]
    assert capitalize_token("kiTTEN", True, keep, True) == "Kitten"
    assert capitalize_token("and", True, keep, True) == "And"
    assert capitalize_token("AnD", True, keep, True) == "And"
    assert capitalize_token("AnD", True, keep, False) == "And"
    assert capitalize_token("big", True, keep, True) == "Big"
    assert capitalize_token("BIG", True, keep, True) == "BIG"
    assert (
        capitalize_token("Hello thEre my Name is Ryan", True, keep, True)
        == "Hello there my name is ryan"
    )
    # all words
    assert (
        capitalize_token("hello world", only_first_word=False)
        == "Hello World"
    )
    # keep words stay lowercase mid-token
    assert (
        capitalize_token(
            "big and small", only_first_word=False, keep=["and"]
        )
        == "Big and Small"
    )
    # maxWordCount exceeded restores the original
    assert (
        capitalize_token("one two three", only_first_word=False,
                         max_word_count=2)
        == "one two three"
    )
    with pytest.raises(ValueError):
        capitalize_token("x", min_word_length=-1)


def test_pattern_replace():
    # TestPatternReplaceFilter semantics
    assert pattern_replace("fooaabar", "a+", "-") == "foo-b-r"
    assert pattern_replace("fooaabaar", "a+", "-", False) == "foo-baar"
    assert pattern_replace("nomatch", "zz", "-") == "nomatch"


def test_keep_words_and_types():
    assert keep_word_tokens(["foo", "bar"], ["bar"]) == ["bar"]
    assert keep_word_tokens(["Foo"], ["foo"], ignore_case=True) == ["Foo"]
    assert keep_types([("1", "<NUM>"), ("x", "<ALPHANUM>")], ["<NUM>"]) == [
        "1"
    ]
    assert keep_types(
        [("1", "<NUM>"), ("x", "<ALPHANUM>")], ["<NUM>"], False
    ) == ["x"]


def test_truncate_limit_dedup():
    assert truncate_token("abcdefg", 3) == "abc"
    with pytest.raises(ValueError):
        truncate_token("x", 0)
    assert limit_token_count(["a", "b", "c"], 2) == ["a", "b"]
    with pytest.raises(ValueError):
        limit_token_count(["a"], 0)
    assert remove_duplicate_tokens(
        [("a", 0), ("a", 0), ("b", 0), ("a", 1), ("a", 1)]
    ) == [("a", 0), ("b", 0), ("a", 1)]


def test_delimited_tf_and_override():
    assert delimited_term_frequency("term|3") == ("term", 3)
    assert delimited_term_frequency("plain") == ("plain", 1)
    with pytest.raises(ValueError):
        delimited_term_frequency("bad|0")
    assert (
        stemmer_override("running", {"running": "run!"}, lambda w: w[:-3])
        == "run!"
    )
    assert stemmer_override("walking", {}, lambda w: w[:-3]) == "walk"
    assert stemmer_override("walking", {}) == "walking"


def test_date_recognizer_keeps_only_dates():
    from lucene_spark.analysis.miscfilters import date_recognizer

    # DateRecognizerFilter.java:28 — default ENGLISH DateFormat accepts
    # "Jan 12, 1952"-style terms; everything else is dropped
    assert date_recognizer(
        ["Jan 12, 1952", "foo", "January 2, 2006", "12", "2006-01-02"]
    ) == ["Jan 12, 1952", "January 2, 2006"]
    assert date_recognizer(["2006-01-02"], formats=("%Y-%m-%d",)) == ["2006-01-02"]


def test_protected_term_skips_wrapped_filter():
    from lucene_spark.analysis.miscfilters import protected_term

    # ProtectedTermFilter.java:33 — wrapped filter bypassed for the set
    assert protected_term(
        ["running", "jumping", "walking"], ["running", "walking"],
        lambda t: t[:-3],
    ) == ["running", "jump", "walking"]


def _fg(toks):
    from lucene_spark.analysis.miscfilters import flatten_graph

    out = flatten_graph(toks)
    return ([t[0] for t in out], [t[1] for t in out], [t[2] for t in out])


def test_flatten_graph_wtf1():
    # TestFlattenGraphFilter.testWTF1: parallel side paths flatten to a sausage
    terms, incs, lens = _fg([
        ("wtf", 1, 5, 0, 3), ("what", 0, 1, 0, 3), ("wow", 0, 3, 0, 3),
        ("the", 1, 1, 0, 3), ("fudge", 1, 3, 0, 3), ("that's", 1, 1, 0, 3),
        ("funny", 1, 1, 0, 3), ("happened", 1, 1, 4, 12),
    ])
    assert terms == ["wtf", "what", "wow", "the", "that's", "fudge", "funny", "happened"]
    assert incs == [1, 0, 0, 1, 0, 1, 0, 1]
    assert lens == [3, 1, 1, 1, 1, 1, 1, 1]


def test_flatten_graph_already_flat():
    # testAlreadyFlatten: flat inputs pass through (wtf posLen 1 stays 1)
    terms, incs, lens = _fg([
        ("wtf", 1, 1, 0, 3), ("what", 0, 1, 0, 3), ("wow", 0, 1, 0, 3),
        ("the", 1, 1, 0, 3), ("that's", 0, 1, 0, 3), ("fudge", 1, 1, 0, 3),
        ("funny", 0, 1, 0, 3), ("happened", 1, 1, 4, 12),
    ])
    assert terms == ["wtf", "what", "wow", "the", "that's", "fudge", "funny", "happened"]
    assert incs == [1, 0, 0, 1, 0, 1, 0, 1]
    assert lens == [1, 1, 1, 1, 1, 1, 1, 1]


def test_flatten_graph_non_graph_and_hole():
    # testNonGraph: plain stream unchanged
    terms, incs, lens = _fg([
        ("hello", 1, 1, 0, 5), ("pseudo", 1, 1, 6, 12),
        ("world", 1, 1, 13, 18), ("fun", 1, 1, 19, 22),
    ])
    assert incs == [1, 1, 1, 1] and lens == [1, 1, 1, 1]
    # testSimpleHole: the position hole (deleted stopword) survives
    terms, incs, lens = _fg([
        ("hello", 1, 1, 0, 5), ("hole", 2, 1, 6, 10), ("fun", 1, 1, 11, 13),
    ])
    assert terms == ["hello", "hole", "fun"]
    assert incs == [1, 2, 1]
    assert lens == [1, 1, 1]


def test_flatten_graph_strangely_numbered_nodes():
    # testStrangelyNumberedNodes: an unused node id is NOT a hole
    terms, incs, lens = _fg([
        ("dog", 1, 3, 0, 5), ("puppy", 0, 3, 0, 5), ("flies", 3, 1, 6, 11),
    ])
    assert terms == ["dog", "puppy", "flies"]
    assert incs == [1, 0, 1]
    assert lens == [1, 1, 1]


def test_flatten_graph_empty():
    from lucene_spark.analysis.miscfilters import flatten_graph

    assert flatten_graph([]) == []


def test_flatten_graph_leading_hole_preserved():
    # a deleted LEADING stopword (first token posInc=2) must keep its
    # increment — code-review regression
    from lucene_spark.analysis.miscfilters import flatten_graph

    out = flatten_graph([("b", 2, 1), ("c", 1, 1)])
    assert [(t[0], t[1]) for t in out] == [("b", 2), ("c", 1)]


# --------------------------------------------- ConcatenateGraphFilter


def test_concatenate_graph_simple_phrase():
    from lucene_spark.analysis.miscfilters import concatenate_graph_paths

    assert concatenate_graph_paths(
        [("a", 1, 1), ("b", 1, 1)], token_separator="/"
    ) == ["a/b"]


def test_concatenate_graph_synonym_paths():
    from lucene_spark.analysis.miscfilters import (
        SEP_LABEL,
        concatenate_graph_paths,
    )

    stream = [("wifi", 1, 2), ("wi", 0, 1), ("fi", 1, 1), ("net", 1, 1)]
    got = concatenate_graph_paths(stream, token_separator="/")
    assert got == ["wi/fi/net", "wifi/net"]
    # default separator is the reference's SEP_LABEL (U+001F)
    assert concatenate_graph_paths(stream) == [
        "wi" + SEP_LABEL + "fi" + SEP_LABEL + "net",
        "wifi" + SEP_LABEL + "net",
    ]


def test_concatenate_graph_no_separator_dedupes():
    from lucene_spark.analysis.miscfilters import concatenate_graph_paths

    stream = [("wifi", 1, 2), ("wi", 0, 1), ("fi", 1, 1), ("net", 1, 1)]
    # "wi"+"fi"+"net" == "wifi"+"net": the automaton accepts ONE string
    assert concatenate_graph_paths(stream, token_separator=None) == ["wifinet"]


def test_concatenate_graph_holes():
    from lucene_spark.analysis.miscfilters import concatenate_graph_paths

    stream = [("a", 1, 1), ("b", 3, 1)]
    # two skipped positions -> two empty slots between the tokens
    assert concatenate_graph_paths(stream, token_separator="/") == ["a///b"]
    assert concatenate_graph_paths(
        stream, token_separator="/", preserve_position_increments=False
    ) == ["a/b"]


def test_concatenate_graph_expansion_limit():
    import pytest

    from lucene_spark.analysis.miscfilters import concatenate_graph_paths

    # 4 binary choices -> 16 paths
    stream = []
    for i in range(4):
        stream += [(f"x{i}", 1, 1), (f"y{i}", 0, 1)]
    assert len(concatenate_graph_paths(stream, token_separator="/")) == 16
    with pytest.raises(ValueError):
        concatenate_graph_paths(stream, max_graph_expansions=10)


def test_concatenate_graph_rejects_bad_pos_length():
    import pytest

    from lucene_spark.analysis.miscfilters import concatenate_graph_paths

    with pytest.raises(ValueError):
        concatenate_graph_paths([("a", 1, 0)])
