"""RefinedSoundex / Caverphone2 / NYSIIS vs the reference's
TestPhoneticFilter.java vectors and the published spec examples."""

import pytest

from lucene_spark.analysis.phonetic import (
    caverphone2,
    nysiis,
    refined_soundex,
)

REFINED = [("aaa", "A0"), ("bbb", "B1"), ("ccc", "C3"),
           ("easgasg", "E034034"), ("", "")]

CAVER = [
    # TestPhoneticFilter.java:76-93
    ("Darda", "TTA1111111"), ("Karleen", "KLN1111111"),
    ("Datha", "TTA1111111"), ("Carlene", "KLN1111111"),
    # Caverphone 2.0 spec examples (Hood 2004)
    ("Stevenson", "STFNSN1111"), ("Peter", "PTA1111111"),
    ("Thompson", "TMPSN11111"),
]

NYSIIS = [
    # TestPhoneticFilter.java:96-100
    ("aaa", "A"), ("bbb", "B"), ("ccc", "C"), ("easgasg", "EASGAS"),
    # published NYSIIS examples
    ("MACINTOSH", "MCANT"), ("KNUTH", "NAT"), ("PHILLIPSON", "FALAPS"),
]


@pytest.mark.parametrize("word,want", REFINED)
def test_refined_soundex(word, want):
    assert refined_soundex(word) == want


@pytest.mark.parametrize("word,want", CAVER)
def test_caverphone2(word, want):
    assert caverphone2(word) == want


@pytest.mark.parametrize("word,want", NYSIIS)
def test_nysiis(word, want):
    assert nysiis(word) == want


def test_nysiis_non_strict():
    assert nysiis("PHILLIPSON", strict=False) == "FALAPSAN"
    assert nysiis("") == ""
    assert caverphone2("") == "1111111111"
