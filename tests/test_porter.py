"""Porter stemmer goldens (published algorithm examples + reference
vocabulary pairs) and english analyzer chain behavior."""

import os
import sys

import pytest
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.analysis import (
    english_analyze,
    english_term_freqs,
    porter_stem,
    strip_possessive,
)

# (word, stem) pairs: step examples from Porter's 1980 paper plus
# full-pipeline outputs from the reference vocabulary, including the
# two Lucene departures (bli→ble path, logi→log).
GOLDENS = [
    # step 1a
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    # step 1b (+ cleanup rules)
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"), ("sky", "sky"),
    # step 2 (through the full pipeline)
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    # step 4
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # length <= 2 unchanged
    ("a", "a"), ("is", "is"), ("by", "by"),
]


@pytest.mark.parametrize("word,stem", GOLDENS)
def test_porter_goldens(word, stem):
    assert porter_stem(word) == stem


def test_possessive_filter():
    assert strip_possessive("john's") == "john"
    assert strip_possessive("john’s") == "john"
    assert strip_possessive("johns") == "johns"
    assert strip_possessive("'s") == ""


def test_english_analyze_chain():
    # possessive → stop → stem, with pre-stop positions preserved
    toks = english_analyze("The engineer's DESIGNS are failing badly")
    assert toks == [("engin", 1), ("design", 2), ("fail", 4), ("badli", 5)]


def test_english_term_freqs_matches_analyze():
    text = "Relational databases are joining tables; joins use hashes and hashing"
    cnt, dl = english_term_freqs(text)
    from collections import Counter

    ref = Counter(t for t, _ in english_analyze(text))
    assert cnt == dict(ref)
    assert dl == len(english_analyze(text))


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=0, max_size=20))
def test_porter_total_and_idempotent_on_own_output_length(word):
    # never crashes, never grows the word
    s = porter_stem(word)
    assert len(s) <= len(word) + 1  # at* -> ate can add one char


def test_english_index_build(spark):
    from lucene_spark.index import InvertedIndex
    from lucene_spark.search import IndexSearcher, TermQuery

    docs = spark.createDataFrame(
        [
            (0, "The engineers designed a system"),
            (1, "design is designing designs"),
            (2, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    idx = InvertedIndex.build(docs, analyzer="english", docs_per_segment=4)
    hits = {
        r["doc_id"]
        for r in IndexSearcher(idx).search(TermQuery("design"), k=10).collect()
    }
    assert hits == {0, 1}
    terms = {r["term"] for r in idx.terms.collect()}
    assert "design" in terms and "designs" not in terms and "engin" in terms
