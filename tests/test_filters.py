"""Analysis filters (analysis/common re-expressions): goldens matching
the reference filters' documented behavior, all-JVM column functions.
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.filters import (
    ascii_fold,
    char_ngrams,
    edge_ngrams,
    keyword_token,
    length_filter,
    shingles,
    synonym_expand,
    trim_filter,
    whitespace_tokens,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _toks(spark, *tokens):
    return F.array(*[F.lit(t) for t in tokens])


def test_whitespace_tokens(spark):
    df = spark.createDataFrame([("Foo  Bar\tbaz ",), ("",)], ["t"]).select(
        whitespace_tokens(F.col("t")).alias("v")
    )
    rows = [r["v"] for r in df.collect()]
    # no lowercasing (WhitespaceAnalyzer), whitespace runs collapse
    assert rows[0] == ["Foo", "Bar", "baz"]
    assert rows[1] == []


def test_keyword_token(spark):
    df = spark.createDataFrame([("New York",), ("",), (None,)], ["t"]).select(
        keyword_token(F.col("t")).alias("v")
    )
    rows = [r["v"] for r in df.collect()]
    assert rows[0] == ["New York"]
    assert rows[1] == [] and rows[2] == []


def test_length_and_trim_filters(spark):
    got = _one(
        spark, length_filter(_toks(spark, "a", "ab", "abc", "abcd"), 2, 3)
    )
    assert got == ["ab", "abc"]
    got = _one(spark, trim_filter(_toks(spark, " a ", "b\t")))
    assert got == ["a", "b"]


def test_shingles_bigram_default(spark):
    # ShingleFilter javadoc example: "please divide this sentence"
    # -> bigrams "please divide", "divide this", "this sentence"
    toks = _toks(spark, "please", "divide", "this", "sentence")
    assert _one(spark, shingles(toks)) == [
        "please divide",
        "divide this",
        "this sentence",
    ]


def test_shingles_with_unigrams_and_trigram(spark):
    toks = _toks(spark, "a", "b", "c")
    got = _one(spark, shingles(toks, 2, 3, output_unigrams=True))
    # stream order: per start position, unigram then sizes ascending
    assert got == ["a", "a b", "a b c", "b", "b c", "c"]
    # shorter than min_shingle: unigrams only
    assert _one(spark, shingles(_toks(spark, "x"), 2, 3, output_unigrams=True)) == ["x"]
    assert _one(spark, shingles(_toks(spark, "x"), 2, 3)) == []


def test_edge_ngrams(spark):
    got = _one(spark, edge_ngrams(_toks(spark, "spark", "io"), 2, 3))
    assert got == ["sp", "spa", "io"]
    # tokens shorter than min_gram are dropped
    assert _one(spark, edge_ngrams(_toks(spark, "a"), 2, 3)) == []
    # preserve_original re-emits long tokens whole
    got = _one(spark, edge_ngrams(_toks(spark, "spark"), 2, 3, preserve_original=True))
    assert got == ["sp", "spa", "spark"]


def test_char_ngrams(spark):
    # sizes ascending, offsets ascending within a size
    assert _one(spark, char_ngrams(_toks(spark, "abc"), 1, 2)) == [
        "a", "b", "c", "ab", "bc",
    ]
    assert _one(spark, char_ngrams(_toks(spark, "ab"), 3, 3)) == []


def test_ascii_fold(spark):
    df = spark.createDataFrame(
        [("Crème Brûlée à São-Paulo ĄĆĘŁŃ œuf straße Þing",)], ["t"]
    ).select(ascii_fold(F.col("t")).alias("v"))
    assert (
        df.collect()[0]["v"]
        == "Creme Brulee a Sao-Paulo ACELN oeuf strasse THing"
    )


def test_ascii_fold_identity_on_ascii(spark):
    s = "plain ascii stays 123 !?"
    df = spark.createDataFrame([(s,)], ["t"]).select(ascii_fold(F.col("t")).alias("v"))
    assert df.collect()[0]["v"] == s


def test_synonym_expand_keep_original(spark):
    got = _one(
        spark,
        synonym_expand(
            _toks(spark, "fast", "car"), {"fast": ["quick", "rapid"]}
        ),
    )
    # posIncrement-0 stacking: position 0 holds original + synonyms
    assert got == [["fast", "quick", "rapid"], ["car"]]


def test_synonym_expand_replace_mode(spark):
    got = _one(
        spark,
        synonym_expand(
            _toks(spark, "colour", "car"),
            {"colour": ["color"]},
            keep_original=False,
        ),
    )
    assert got == [["color"], ["car"]]


def test_shingle_index_roundtrip(spark):
    """Shingled text indexes through the normal build path: a bigram
    'hash join' becomes ONE term — the index-time phrase speedup
    ShingleFilter exists for."""
    from lucene_spark.index import InvertedIndex
    from lucene_spark.search import IndexSearcher, TermQuery

    docs = spark.createDataFrame(
        [(0, "hash join wins"), (1, "join hash loses"), (2, "hash join again")],
        ["doc_id", "text"],
    )
    sh = docs.select(
        "doc_id",
        F.array_join(
            shingles(whitespace_tokens(F.col("text")), 2, 2, separator="_")
        , " ").alias("text"),
    )
    idx = InvertedIndex.build(sh, analyzer="simple", docs_per_segment=16)
    hits = IndexSearcher(idx).search(TermQuery("hash_join"), k=10)
    assert {r["doc_id"] for r in hits.collect()} == {0, 2}


def test_word_delimiter_parts(spark):
    from pyspark.sql import functions as F

    from lucene_spark.analysis.filters import word_delimiter_parts

    df = spark.createDataFrame(
        [("WiFi",), ("PowerShot500",), ("wi-fi",), ("HTTPServer",), ("",)],
        ["t"],
    )
    got = {
        r["t"]: r["p"]
        for r in df.select(
            "t", word_delimiter_parts(F.col("t")).alias("p")
        ).collect()
    }
    assert got["WiFi"] == ["Wi", "Fi"]
    assert got["PowerShot500"] == ["Power", "Shot", "500"]
    assert got["wi-fi"] == ["wi", "fi"]
    assert got["HTTPServer"] == ["HTTP", "Server"]
    assert got[""] == []
    full = {
        r["t"]: r["p"]
        for r in df.select(
            "t",
            word_delimiter_parts(
                F.col("t"), catenate_all=True, preserve_original=True
            ).alias("p"),
        ).collect()
    }
    assert full["wi-fi"] == ["wi", "fi", "wifi", "wi-fi"]
    assert full["WiFi"] == ["Wi", "Fi", "WiFi"]  # distinct: no dup original


def test_common_grams_and_reverse(spark):
    from pyspark.sql import functions as F

    from lucene_spark.analysis.filters import common_grams, reverse_tokens

    df = spark.createDataFrame(
        [(["the", "quick", "fox", "of", "doom"],), ([],), (["one"],)], ["t"]
    )
    got = [
        r["g"]
        for r in df.select(
            common_grams(F.col("t"), ["the", "of"]).alias("g")
        ).collect()
    ]
    assert got == [["the_quick", "fox_of", "of_doom"], [], []]
    rev = [
        r["r"] for r in df.select(reverse_tokens(F.col("t")).alias("r")).collect()
    ]
    assert rev == [["eht", "kciuq", "xof", "fo", "mood"], [], ["eno"]]


def test_fingerprint(spark):
    """FingerprintFilter: sorted dedup concat, size cap → NULL
    (TestFingerprintFilter.java behaviors)."""
    from pyspark.sql import functions as F

    from lucene_spark.analysis.filters import fingerprint

    df = spark.createDataFrame(
        [
            (["B", "A", "B"],),
            (["singleton"],),
            ([],),
            (["x" * 600, "y" * 600],),  # exceeds 1024 with separator
        ],
        "toks array<string>",
    )
    rows = df.select(fingerprint(F.col("toks")).alias("fp")).collect()
    assert rows[0].fp == "A B"
    assert rows[1].fp == "singleton"
    assert rows[2].fp == ""
    assert rows[3].fp is None
    # custom separator, like the reference's configurable char
    r = df.limit(1).select(
        fingerprint(F.col("toks"), separator="_").alias("fp")
    ).first()
    assert r.fp == "A_B"


def test_tee_tokens_single_analysis_pass(spark):
    from pyspark.sql import functions as F

    from lucene_spark.analysis.filters import shingles, tee_tokens

    docs = spark.createDataFrame(
        [(0, "Quick brown fox"), (1, "lazy dog")], "doc_id long, text string"
    )
    teed = tee_tokens(docs)
    try:
        # sink 1: term counts; sink 2: shingles — both from one stream
        counts = teed.select(F.explode("tokens").alias("t")).groupBy("t").count()
        sh = teed.select(shingles(F.col("tokens")).alias("s"))
        got = {r["t"]: r["count"] for r in counts.collect()}
        assert got["quick"] == 1 and got["lazy"] == 1
        rows = {tuple(r["s"]) for r in sh.collect()}
        assert ("quick brown", "brown fox") in rows
        # the second sink reads the CACHE, not a fresh analysis pass
        plan = sh._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        assert "ArrowEvalPython" not in plan.split("InMemoryRelation")[0]
    finally:
        teed.unpersist()
