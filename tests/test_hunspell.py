"""Hunspell core: affix parsing, twofold suffixes, condition classes,
prefix×suffix cross products — verified against the reference's own
simple.aff/simple.dic and condition.aff/condition.dic stemmer fixtures
(TestStemmer.java / TestCondition.java), plus the UDF surface."""

import pytest

from lucene_spark.analysis.hunspell import HunspellDictionary, hunspell_stem_udf

# the reference's simple.aff / simple.dic test fixture, verbatim data
SIMPLE_AFF = """SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

SFX A Y 3
SFX A   0     e         n
SFX A   0     e         t
SFX A   0     e         h

SFX C Y 2
SFX C   0     d/C       c
SFX C   0     c         b

SFX D Y 1
SFX D   0     s         o

SFX E Y 1
SFX E   0     d         o

PFX B Y 1
PFX B   0     s         o
"""

SIMPLE_DIC = """9
ab/C
apach/A
foo/D
foo/E
lucen/A
lucene
mahout/A
moo/E
olr/B
db
"""

# rows from TestStemmer.java
SIMPLE_FIXTURES = [
    ("ab", ["ab"]), ("abc", ["ab"]), ("apach", ["apach"]),
    ("apache", ["apach"]), ("foo", ["foo", "foo"]), ("food", ["foo"]),
    ("foos", ["foo"]), ("lucen", ["lucen"]),
    ("lucene", ["lucen", "lucene"]), ("mahout", ["mahout"]),
    ("mahoute", ["mahout"]), ("moo", ["moo"]), ("mood", ["moo"]),
    ("olr", ["olr"]), ("solr", ["olr"]),
    # negatives — incl. the twofold-licensing case abcd
    ("abcd", []), ("abs", []), ("abe", []), ("sab", []),
    ("sapach", []), ("sapache", []), ("apachee", []),
]

CONDITION_AFF = """SET UTF-8

PFX A Y 1
PFX A 0 re .

SFX B Y 2
SFX B 0 ed [^y]
SFX B y ied y
"""

CONDITION_DIC = """3
hello
try/B
work/AB
"""

# rows from TestCondition.java
CONDITION_FIXTURES = [
    ("hello", ["hello"]), ("try", ["try"]), ("tried", ["try"]),
    ("work", ["work"]), ("worked", ["work"]), ("rework", ["work"]),
    ("reworked", ["work"]),
    ("retried", []), ("workied", []), ("tryed", []), ("tryied", []),
    ("helloed", []),
]


@pytest.fixture(scope="module")
def simple():
    return HunspellDictionary(SIMPLE_AFF, SIMPLE_DIC)


@pytest.fixture(scope="module")
def condition():
    return HunspellDictionary(CONDITION_AFF, CONDITION_DIC)


@pytest.mark.parametrize("word,want", SIMPLE_FIXTURES)
def test_simple_fixtures(simple, word, want):
    assert sorted(simple.stem(word)) == sorted(want)


@pytest.mark.parametrize("word,want", CONDITION_FIXTURES)
def test_condition_fixtures(condition, word, want):
    assert sorted(condition.stem(word)) == sorted(want)


def test_flag_long_mode():
    d = HunspellDictionary(
        "FLAG long\nSFX Y1 Y 1\nSFX Y1 0 s .\n", "1\ncat/Y1\n"
    )
    assert d.stem("cats") == ["cat"]
    assert d.stem("cat") == ["cat"]


def test_flag_num_mode():
    d = HunspellDictionary(
        "FLAG num\nSFX 65000 Y 1\nSFX 65000 0 s .\n", "1\ncat/65000,12\n"
    )
    assert d.stem("cats") == ["cat"]


def test_stem_one_fallback(simple):
    assert simple.stem_one("solr") == "olr"
    assert simple.stem_one("zzz") == "zzz"


def test_udf(spark):
    df = spark.createDataFrame(
        [("solr",), ("mahoute",), ("zzz",)], "w string"
    )
    rows = (
        df.select("w", hunspell_stem_udf(SIMPLE_AFF, SIMPLE_DIC)("w")
                  .alias("s"))
        .collect()
    )
    got = {r.w: r.s for r in rows}
    assert got == {"solr": "olr", "mahoute": "mahout", "zzz": "zzz"}
