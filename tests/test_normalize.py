"""Normalization filter pack vs the reference test vectors.

Every vector below is transcribed from the reference's own unit tests
(file:line cited per block) so drift in any rule turns a test red.
"""

import pytest

from lucene_spark.analysis.normalize import (
    ELISION_ARTICLES,
    elision,
    german_normalize,
    irish_lowercase,
    normalize_token,
    scandinavian_fold,
    scandinavian_normalize,
    serbian_normalize,
)

# TestGermanNormalizationFilter.java:53-64
GERMAN = [
    ("Schaltflächen", "Schaltflachen"),
    ("Schaltflaechen", "Schaltflachen"),
    ("dauer", "dauer"),
    ("weißbier", "weissbier"),
    ("", ""),
]

# TestScandinavianNormalizationFilter.java:30-86
SCN_NORM = [
    ("aeäaeeea", "æææeea"),
    ("aeäaeeeae", "æææeeæ"),
    ("aeaeeeae", "ææeeæ"),
    ("bøen", "bøen"),
    ("bOEen", "bØen"),
    ("åene", "åene"),
    ("blåbærsyltetøj", "blåbærsyltetøj"),
    ("blaabaersyltetöj", "blåbærsyltetøj"),
    ("räksmörgås", "ræksmørgås"),
    ("raeksmörgaos", "ræksmørgås"),
    ("raeksmörgaas", "ræksmørgås"),
    ("raeksmoergås", "ræksmørgås"),
    ("ab", "ab"),
    ("ob", "ob"),
    ("Ab", "Ab"),
    ("Ob", "Ob"),
    ("å", "å"),
    ("aa", "å"),
    ("aA", "å"),
    ("ao", "å"),
    ("aO", "å"),
    ("AA", "Å"),
    ("Aa", "Å"),
    ("Ao", "Å"),
    ("AO", "Å"),
    ("æ", "æ"),
    ("ä", "æ"),
    ("Æ", "Æ"),
    ("Ä", "Æ"),
    ("ae", "æ"),
    ("aE", "æ"),
    ("Ae", "Æ"),
    ("AE", "Æ"),
    ("ö", "ø"),
    ("ø", "ø"),
    ("Ö", "Ø"),
    ("Ø", "Ø"),
    ("oo", "ø"),
    ("oe", "ø"),
    ("oO", "ø"),
]

# TestScandinavianFoldingFilter.java:51-104
SCN_FOLD = [
    ("aeäaeeea", "aaaeea"),
    ("aeäaeeeae", "aaaeea"),
    ("aeaeeeae", "aaeea"),
    ("bøen", "boen"),
    ("åene", "aene"),
    ("blåbærsyltetøj", "blabarsyltetoj"),
    ("blaabaarsyltetoej", "blabarsyltetoj"),
    ("blåbärsyltetöj", "blabarsyltetoj"),
    ("raksmorgas", "raksmorgas"),
    ("räksmörgås", "raksmorgas"),
    ("ræksmørgås", "raksmorgas"),
    ("raeksmoergaas", "raksmorgas"),
    ("ræksmörgaos", "raksmorgas"),
    ("ab", "ab"),
    ("ob", "ob"),
    ("Ab", "Ab"),
    ("Ob", "Ob"),
    ("å", "a"),
    ("aa", "a"),
    ("aA", "a"),
    ("ao", "a"),
    ("aO", "a"),
    ("AA", "A"),
    ("Aa", "A"),
    ("Ao", "A"),
    ("AO", "A"),
    ("æ", "a"),
    ("ä", "a"),
    ("Æ", "A"),
    ("Ä", "A"),
    ("ae", "a"),
    ("aE", "a"),
    ("Ae", "A"),
    ("AE", "A"),
    ("ö", "o"),
    ("ø", "o"),
    ("Ö", "O"),
    ("Ø", "O"),
    ("oo", "o"),
    ("oe", "o"),
]


@pytest.mark.parametrize("word,expected", GERMAN)
def test_german_normalize(word, expected):
    assert german_normalize(word) == expected


@pytest.mark.parametrize("word,expected", SCN_NORM)
def test_scandinavian_normalize(word, expected):
    assert scandinavian_normalize(word) == expected


@pytest.mark.parametrize("word,expected", SCN_FOLD)
def test_scandinavian_fold(word, expected):
    assert scandinavian_fold(word) == expected


def test_serbian_cyrillic():
    # TestSerbianNormalizationFilter.java:53
    assert (
        serbian_normalize("абвгдђежзијклљмнњопрстћуфхцчџш")
        == "abvgddjezzijklljmnnjoprstcufhccdzs"
    )


def test_serbian_latin():
    # TestSerbianNormalizationFilter.java:58-60
    assert (
        serbian_normalize("abcčćddžđefghijklljmnnjoprsštuvzž")
        == "abcccddzdjefghijklljmnnjoprsstuvzz"
    )


def test_irish_lowercase():
    # TestIrishLowerCaseFilter.java:30-38 + empty-term case
    assert irish_lowercase("nAthair") == "n-athair"
    assert irish_lowercase("tUISCE") == "t-uisce"
    assert irish_lowercase("hARD") == "hard"
    assert irish_lowercase("") == ""
    # plain words lowercase normally; n/t before lower vowel untouched
    assert irish_lowercase("nathair") == "nathair"
    assert irish_lowercase("Teach") == "teach"


def test_elision_french():
    # TestElision.java:36-46 semantics with the FrenchAnalyzer set
    assert elision("l'embrouille") == "embrouille"
    assert elision("O'brian") == "O'brian"
    assert elision("M'enfin") == "enfin"
    assert elision("qu'avez") == "avez"
    assert elision("jusqu'ici") == "ici"
    # typographic apostrophe U+2019 (ElisionFilter.java:56)
    assert elision("L’avion") == "avion"
    # only the FIRST apostrophe is considered
    assert elision("l'o'clock") == "o'clock"
    assert elision("plop") == "plop"


def test_elision_other_languages():
    assert elision("dell'arte", "it") == "arte"
    assert elision("sull'onda", "it") == "onda"
    assert elision("l'aigua", "ca") == "aigua"
    assert elision("d'athair", "ga") == "athair"
    # 'qu' is in fr but not ca
    assert elision("qu'est", "ca") == "qu'est"
    assert "qu" in ELISION_ARTICLES["fr"]
    assert "qu" not in ELISION_ARTICLES["ca"]


def test_normalize_token_dispatch():
    assert normalize_token("de_norm", "weißbier") == "weissbier"
    assert normalize_token("elision_it", "dell'arte") == "arte"
    with pytest.raises(ValueError):
        normalize_token("nope", "x")


def test_normalize_udf_spark(spark):
    from pyspark.sql import functions as F

    from lucene_spark.analysis.normalize import normalize_udf

    df = spark.createDataFrame(
        [("Schaltflaechen",), ("weißbier",), (None,)], "word string"
    )
    out = df.select(normalize_udf("de_norm")("word").alias("n")).collect()
    assert [r.n for r in out] == ["Schaltflachen", "weissbier", None]
