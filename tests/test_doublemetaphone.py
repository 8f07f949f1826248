"""Double Metaphone vs the reference filter vectors
(TestDoubleMetaphoneFilter.java, TestPhoneticFilter.java) and the
published algorithm's canonical examples."""

import pytest

from lucene_spark.analysis.doublemetaphone import double_metaphone as dm

# TestDoubleMetaphoneFilter.java:33-68 + TestPhoneticFilter.java:46-54
REFERENCE = [
    ("international", 4, ("ANTR", "ANTR")),
    ("international", 8, ("ANTRNXNL", "ANTRNXNL")),
    ("Kuczewski", 4, ("KSSK", "KXFS")),
    ("hello", 4, ("HL", "HL")),
    ("aaa", 4, ("A", "A")),
    ("bbb", 4, ("PP", "PP")),
    ("ccc", 4, ("KK", "KK")),
    ("easgasg", 4, ("ASKS", "ASKS")),
]

# canonical examples from the published algorithm / commons-codec suite
CANONICAL = [
    ("testing", ("TSTN", "TSTN")),
    ("The", ("0", "T")),
    ("quick", ("KK", "KK")),
    ("brown", ("PRN", "PRN")),
    ("fox", ("FKS", "FKS")),
    ("jumped", ("JMPT", "AMPT")),
    ("over", ("AFR", "AFR")),
    ("lazy", ("LS", "LS")),
    ("dogs", ("TKS", "TKS")),
    ("jose", ("HS", "HS")),
    ("smith", ("SM0", "XMT")),
    ("schmidt", ("XMT", "SMT")),
    ("snider", ("SNTR", "XNTR")),
    ("school", ("SKL", "SKL")),
    ("ghislane", ("JLN", "JLN")),
    ("caesar", ("SSR", "SSR")),
    ("chianti", ("KNT", "KNT")),
    ("michael", ("MKL", "MXL")),
    ("thomas", ("TMS", "TMS")),
    ("knox", ("NKS", "NKS")),
    ("accident", ("AKST", "AKST")),
    ("Xavier", ("SF", "SFR")),
    ("Wright", ("RT", "RT")),
]


@pytest.mark.parametrize("word,n,want", REFERENCE)
def test_reference_vectors(word, n, want):
    assert dm(word, n) == want


@pytest.mark.parametrize("word,want", CANONICAL)
def test_canonical(word, want):
    got = dm(word)
    assert got[0] == want[0]


def test_alternates():
    # primary != alternate where the algorithm branches
    assert dm("Kuczewski") == ("KSSK", "KXFS")
    assert dm("smith")[1] == "XMT"
    assert dm("The") == ("0", "T")


def test_non_letters_and_empty():
    assert dm("") == ("", "")
    assert dm("12345") == ("", "")
    assert dm("   ") == ("", "")


def test_udf(spark):
    from lucene_spark.analysis.doublemetaphone import double_metaphone_udf

    df = spark.createDataFrame(
        [("international",), ("Kuczewski",), (None,)], "word string"
    )
    p = df.select(double_metaphone_udf(4)("word").alias("c")).collect()
    a = df.select(
        double_metaphone_udf(4, alternate=True)("word").alias("c")
    ).collect()
    assert [r.c for r in p] == ["ANTR", "KSSK", None]
    assert [r.c for r in a] == ["ANTR", "KXFS", None]
