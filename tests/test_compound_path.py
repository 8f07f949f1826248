"""DictionaryCompoundWordTokenFilter + PathHierarchyTokenizer analogs:
reference fixture parity, knobs, Column-variant plan shape."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.compound import decompound, decompound_udf
from lucene_spark.analysis.path import (
    path_prefixes_col,
    path_tokens,
    reverse_path_tokens,
)

SE_DICT = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
           "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
           "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad"]
_SE = frozenset(w.lower() for w in SE_DICT)

# rows from TestCompoundWordTokenFilter.testDumbCompoundWordsSE
SE_FIXTURES = [
    ("Bildörr", ["Bildörr", "Bil", "dörr"]),
    ("Bilmotor", ["Bilmotor", "Bil", "motor"]),
    ("Biltak", ["Biltak", "Bil", "tak"]),
    ("Slagborr", ["Slagborr", "Slag", "borr"]),
    ("Hammarborr", ["Hammarborr", "Hammar", "borr"]),
    ("Pelarborr", ["Pelarborr", "Pelar", "borr"]),
    ("Glasögonfodral", ["Glasögonfodral", "Glas", "ögon", "fodral"]),
    ("Basfiolsfodral", ["Basfiolsfodral", "Bas", "fiol", "fodral"]),
    ("Basfiolsfodralmakaregesäll",
     ["Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral", "makare",
      "gesäll"]),
    ("Skomakare", ["Skomakare", "Sko", "makare"]),
    ("Vindrutetorkare", ["Vindrutetorkare", "Vind", "rute", "torkare"]),
    ("Vindrutetorkarblad", ["Vindrutetorkarblad", "Vind", "rute", "blad"]),
    ("abba", ["abba"]),
]


@pytest.mark.parametrize("word,want", SE_FIXTURES)
def test_se_reference_fixtures(word, want):
    assert decompound(word, _SE) == want


def test_min_word_size_passthrough():
    assert decompound("Bil", _SE) == ["Bil"]  # < 5 chars: whole


def test_only_longest_match():
    d = frozenset(["basketball", "basket", "ball", "kurv"])
    # longest per start: 'basket' suppressed by 'basketball'
    got = decompound("basketballkurv", d, only_longest_match=True)
    assert got == ["basketballkurv", "basketball", "ball", "kurv"]


def test_no_subwords_skips_contained():
    d = frozenset(["schweinefleisch", "fleisch", "schwein", "wein"])
    got = decompound("schweinefleisch", d, no_subwords=True,
                     max_subword_size=20)
    # after 'schweinefleisch' longest-matches at 0, scan resumes at
    # its end: 'wein'/'fleisch' inside are suppressed
    assert got == ["schweinefleisch", "schweinefleisch"]


def test_decompound_udf(spark):
    df = spark.createDataFrame([(w,) for w, _ in SE_FIXTURES], "w string")
    rows = df.select("w", decompound_udf(SE_DICT)("w").alias("parts")).collect()
    want = dict(SE_FIXTURES)
    for r in rows:
        assert list(r.parts) == want[r.w]


# ---------------------------------------------------------------------------
# path hierarchy (TestPathHierarchyTokenizer / Reverse fixtures)

PATH_FIXTURES = [
    ("/a/b/c", 0, ["/a", "/a/b", "/a/b/c"]),
    ("/a/b/c/", 0, ["/a", "/a/b", "/a/b/c", "/a/b/c/"]),
    ("a/b/c", 0, ["a", "a/b", "a/b/c"]),
    ("a/b/c/", 0, ["a", "a/b", "a/b/c", "a/b/c/"]),
    ("/a/b/c", 1, ["/b", "/b/c"]),
    ("/a/b/c/", 1, ["/b", "/b/c", "/b/c/"]),
    ("a/b/c", 1, ["/b", "/b/c"]),
]

REVERSE_FIXTURES = [
    ("/a/b/c", 0, ["/a/b/c", "a/b/c", "b/c", "c"]),
    ("/a/b/c/", 0, ["/a/b/c/", "a/b/c/", "b/c/", "c/"]),
    ("a/b/c", 0, ["a/b/c", "b/c", "c"]),
    ("a/b/c/", 0, ["a/b/c/", "b/c/", "c/"]),
    ("/a/b/c/", 1, ["/a/b/", "a/b/", "b/"]),
    ("a/b/c", 1, ["a/b/", "b/"]),
    ("a/b/c/", 1, ["a/b/", "b/"]),
]


@pytest.mark.parametrize("path,skip,want", PATH_FIXTURES)
def test_path_tokens(path, skip, want):
    assert path_tokens(path, skip=skip) == want


@pytest.mark.parametrize("path,skip,want", REVERSE_FIXTURES)
def test_reverse_path_tokens(path, skip, want):
    assert reverse_path_tokens(path, skip=skip) == want


def test_replacement_char():
    assert path_tokens("/a/b", replacement="\\") == ["\\a", "\\a\\b"]


def test_path_prefixes_col_matches_kernel(spark):
    paths = ["/a/b/c", "a/b/c", "/x", "/cat/sub/item"]
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    rows = df.select("p", path_prefixes_col(F.col("p")).alias("pre")).collect()
    for r in rows:
        want = [t for t in path_tokens(r.p)]
        assert list(r.pre) == want, r.p


def test_path_prefixes_col_pure_jvm(spark):
    df = spark.createDataFrame([("/a/b/c",)], "p string")
    plan = (
        df.select(path_prefixes_col(F.col("p")).alias("x"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
