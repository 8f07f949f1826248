"""OpenNLP-analog chain: sentence detection, sentence-scoped tokens,
POS, IOB chunking, lemmatization (OpenNLPTokenizer.java:30,
OpenNLPSentenceBreakIterator.java:33, OpenNLPPOSFilter.java:36,
OpenNLPChunkerFilter.java:31, OpenNLPLemmatizerFilter.java:50) plus the
sentence-window chunking pipeline op built on it."""

import pytest

from lucene_spark.analysis.opennlp import (
    chunk_iob,
    detect_sentences,
    lemmatize,
    opennlp_analyze,
    opennlp_tokenize,
    pos_tags,
    sentence_texts,
)


# ---------------------------------------------------------- sentences


def test_basic_sentence_split():
    assert sentence_texts("One here. Two here. Three here.") == [
        "One here.",
        "Two here.",
        "Three here.",
    ]


def test_abbreviation_guard():
    s = sentence_texts("Dr. Smith met Mr. Jones. They talked.")
    assert s == ["Dr. Smith met Mr. Jones.", "They talked."]


def test_initial_guard():
    s = sentence_texts("J. R. Tolkien wrote it. It was long.")
    assert s == ["J. R. Tolkien wrote it.", "It was long."]


def test_decimal_guard():
    s = sentence_texts("It took 3.14 seconds. Then it stopped.")
    assert s == ["It took 3.14 seconds.", "Then it stopped."]


def test_ellipsis_and_multi_terminator():
    s = sentence_texts("Really?! Yes. Well... Maybe.")
    assert s == ["Really?!", "Yes.", "Well...", "Maybe."]


def test_closing_quote_attaches():
    s = sentence_texts('"Was it raining?" No one knew.')
    assert s == ['"Was it raining?"', "No one knew."]


def test_no_terminator_single_sentence():
    assert sentence_texts("no terminator at all") == ["no terminator at all"]


def test_lowercase_continuation_not_split():
    # terminator followed by a lowercase word: not a sentence start
    assert sentence_texts("see fig. 3 for details") == ["see fig. 3 for details"]


def test_spans_are_offsets_into_text():
    t = "Alpha beta gamma. Delta epsilon zeta."
    spans = detect_sentences(t)
    assert [t[a:b].strip() for a, b in spans] == [
        "Alpha beta gamma.",
        "Delta epsilon zeta.",
    ]


# ---------------------------------------------------------- tokenizer


def test_tokens_carry_sentence_index():
    toks = opennlp_tokenize("First one. Second two.")
    sents = {t[3] for t in toks}
    assert sents == {0, 1}
    assert [t[0] for t in toks if t[3] == 0] == ["First", "one", "."]


def test_punctuation_split_and_numbers():
    toks = [t[0] for t in opennlp_tokenize("It cost 1,234.56 dollars (net).")]
    assert "1,234.56" in toks and "(" in toks and ")" in toks and "." in toks


def test_contraction_kept_whole():
    toks = [t[0] for t in opennlp_tokenize("Don't stop.")]
    assert "Don't" in toks


# ---------------------------------------------------------- POS + chunks


def test_pos_closed_class_and_suffix():
    tags = pos_tags(["The", "dogs", "were", "running", "quickly"])
    assert tags == ["DT", "NNS", "VBD", "VBG", "RB"]


def test_chunk_np_vp_pp():
    terms = ["The", "big", "dogs", "ran", "in", "the", "park"]
    tags = ["DT", "JJ", "NNS", "VBD", "IN", "DT", "NN"]
    assert chunk_iob(terms, tags) == [
        "B-NP", "I-NP", "I-NP", "B-VP", "B-PP", "B-NP", "I-NP",
    ]


def test_pronoun_single_token_np():
    assert chunk_iob(["He", "ran"], ["PRP", "VBD"]) == ["B-NP", "B-VP"]


def test_modal_joins_vp():
    assert chunk_iob(["will", "run"], ["MD", "VB"]) == ["B-VP", "I-VP"]


# ---------------------------------------------------------- lemmatizer


@pytest.mark.parametrize(
    "word,pos,lemma",
    [
        ("books", "NNS", "book"),
        ("studies", "NNS", "study"),
        ("boxes", "NNS", "box"),
        ("children", "NNS", "child"),
        ("ran", "VBD", "run"),
        ("stopped", "VBD", "stop"),
        ("tried", "VBD", "try"),
        ("created", "VBD", "create"),
        ("running", "VBG", "run"),
        ("playing", "VBG", "play"),
        ("was", "VBD", "be"),
        ("written", "VBN", "write"),
        ("processes", "VBZ", "process"),
        ("dog", "NN", "dog"),
    ],
)
def test_lemmatize(word, pos, lemma):
    assert lemmatize(word, pos) == lemma


# ---------------------------------------------------------- full chain


def test_full_chain_rows():
    rows = opennlp_analyze("He went home. She has written books.")
    assert rows[0] == ("He", "PRP", "B-NP", "he", 0)
    went = [r for r in rows if r[0] == "went"][0]
    assert went[1] == "VBD" and went[3] == "go" and went[4] == 0
    written = [r for r in rows if r[0] == "written"][0]
    assert written[1] == "VBN" and written[3] == "write" and written[4] == 1


def test_empty_text():
    assert opennlp_analyze("") == []
    assert sentence_texts("") == []
