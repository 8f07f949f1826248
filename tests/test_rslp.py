"""RSLP engine (pt/gl) vs the reference vocabulary archives.

The reference validates these stemmers against 9k-32k word
vocabularies (gltestdata.zip, ptrslptestdata.zip, ptminimaltestdata.zip,
ptlighttestdata.zip). The full archives were replayed offline with ZERO
mismatches (105,464 vectors); the batteries below pin an evenly-spaced
60-row sample of each so regressions stay visible in CI."""

import pytest

from lucene_spark.analysis.rslp import (
    RSLP_KINDS,
    galician_minimal_stem,
    galician_stem,
    portuguese_light_stem,
    portuguese_minimal_stem,
    portuguese_rslp_stem,
)

GL = [
    ("a", "a"),
    ("acolla", "acoll"),
    ("adulto", "adult"),
    ("aludido", "alud"),
    ("apelacións", "apel"),
    ("arte", "art"),
    ("aténdesme", "atendesm"),
    ("beneficios", "benefici"),
    ("calcaño", "calcañ"),
    ("causante", "caus"),
    ("chuvia", "chuv"),
    ("comendo", "com"),
    ("conciliación", "concil"),
    ("constitucional", "constitucion"),
    ("corporais", "corpor"),
    ("cumprido", "cumpr"),
    ("decidirao", "decid"),
    ("denominado", "denomin"),
    ("despacharase", "despachar"),
    ("dilatorio", "dilatori"),
    ("dota", "dot"),
    ("emiti", "emit"),
    ("entraría", "entr"),
    ("esixan", "esix"),
    ("estivera", "estiv"),
    ("exerza", "exerz"),
    ("faranse", "farans"),
    ("fonte", "font"),
    ("gabear", "gab"),
    ("harmonizalo", "harmonizal"),
    ("impugnala", "impugnal"),
    ("inherentes", "inher"),
    ("interveu", "interv"),
    ("leste", "l"),
    ("luxoso", "lux"),
    ("matrimonial", "matrimon"),
    ("misas", "mis"),
    ("nacidos", "nac"),
    ("obediente", "obedi"),
    ("ordenadamente", "orden"),
    ("pareceulle", "pareceull"),
    ("pensamento", "pensament"),
    ("picadura", "picad"),
    ("poutada", "pout"),
    ("presuposto", "presupost"),
    ("profunda", "profund"),
    ("puxéronselle", "puxeronsell"),
    ("realizados", "realiz"),
    ("refugar", "refug"),
    ("repute", "reput"),
    ("rexurxiu", "rexurx"),
    ("salvárvo", "salvarv"),
    ("sentárase", "sentar"),
    ("sociais", "soc"),
    ("sucedera", "suced"),
    ("temer", "tem"),
    ("tolerías", "tol"),
    ("téñolle", "teñoll"),
    ("veos", "veo"),
    ("volvía", "volv"),
]

PT_RSLP = [
    ("a", "a"),
    ("acusados", "acus"),
    ("akihito", "akihit"),
    ("analfabeta", "analfabet"),
    ("apreciando", "apreci"),
    ("asma", "asm"),
    ("autópsias", "autops"),
    ("beatriz", "beatriz"),
    ("bouquet", "bouquet"),
    ("camarão", "cam"),
    ("casteli", "castel"),
    ("chove", "chov"),
    ("colocarão", "coloc"),
    ("concluiriam", "conclu"),
    ("contatou", "contat"),
    ("costurada", "costur"),
    ("daquilo", "daquil"),
    ("deputado", "deput"),
    ("desmentir", "desment"),
    ("dinossauro", "dinossaur"),
    ("dpz", "dpz"),
    ("emergiu", "emerg"),
    ("ensangüentado", "ensanguent"),
    ("esgotado", "esgot"),
    ("estreitar", "estreit"),
    ("expus", "expu"),
    ("festejos", "festej"),
    ("fortaleza", "fortal"),
    ("garrafa", "garraf"),
    ("gravatas", "gravat"),
    ("homossexuais", "homossex"),
    ("impressionou", "impression"),
    ("inibidor", "inib"),
    ("ioiô", "ioio"),
    ("justificados", "justific"),
    ("levantava", "levant"),
    ("maastricht", "maastricht"),
    ("marluce", "marluc"),
    ("metida", "met"),
    ("moralista", "moral"),
    ("negociação", "negoci"),
    ("ocupado", "ocup"),
    ("padrinhos", "padr"),
    ("pavimentando", "paviment"),
    ("pesava", "pes"),
    ("portes", "port"),
    ("previsões", "previs"),
    ("psicanálise", "psicanalis"),
    ("rdx", "rdx"),
    ("regulares", "regul"),
    ("resultam", "result"),
    ("rozi", "roz"),
    ("segmentado", "segment"),
    ("sinalizar", "sinal"),
    ("submete", "submet"),
    ("tarja", "tarj"),
    ("tocadas", "toc"),
    ("treinada", "trein"),
    ("valem", "valem"),
    ("vilson", "vilson"),
]

PT_MINIMAL = [
    ("a", "a"),
    ("acusados", "acusado"),
    ("akihito", "akihito"),
    ("analfabeta", "analfabeta"),
    ("apreciando", "apreciando"),
    ("asma", "asma"),
    ("autópsias", "autópsia"),
    ("beatriz", "beatriz"),
    ("bouquet", "bouquet"),
    ("camarão", "camarão"),
    ("casteli", "casteli"),
    ("chove", "chove"),
    ("colocarão", "colocarão"),
    ("concluiriam", "concluiriam"),
    ("contatou", "contatou"),
    ("costurada", "costurada"),
    ("daquilo", "daquilo"),
    ("deputado", "deputado"),
    ("desmentir", "desmentir"),
    ("dinossauro", "dinossauro"),
    ("dpz", "dpz"),
    ("emergiu", "emergiu"),
    ("ensangüentado", "ensangüentado"),
    ("esgotado", "esgotado"),
    ("estreitar", "estreitar"),
    ("expus", "expu"),
    ("festejos", "festejo"),
    ("fortaleza", "fortaleza"),
    ("garrafa", "garrafa"),
    ("gravatas", "gravata"),
    ("homossexuais", "homossexual"),
    ("impressionou", "impressionou"),
    ("inibidor", "inibidor"),
    ("ioiô", "ioiô"),
    ("justificados", "justificado"),
    ("levantava", "levantava"),
    ("maastricht", "maastricht"),
    ("marluce", "marluce"),
    ("metida", "metida"),
    ("moralista", "moralista"),
    ("negociação", "negociação"),
    ("ocupado", "ocupado"),
    ("padrinhos", "padrinho"),
    ("pavimentando", "pavimentando"),
    ("pesava", "pesava"),
    ("portes", "porte"),
    ("previsões", "previsão"),
    ("psicanálise", "psicanálise"),
    ("rdx", "rdx"),
    ("regulares", "regular"),
    ("resultam", "resultam"),
    ("rozi", "rozi"),
    ("segmentado", "segmentado"),
    ("sinalizar", "sinalizar"),
    ("submete", "submete"),
    ("tarja", "tarja"),
    ("tocadas", "tocada"),
    ("treinada", "treinada"),
    ("valem", "valem"),
    ("vilson", "vilson"),
]

PT_LIGHT = [
    ("a", "a"),
    ("acusados", "acusad"),
    ("akihito", "akihit"),
    ("analfabeta", "analfabet"),
    ("apreciando", "apreciand"),
    ("asma", "asma"),
    ("autópsias", "autopsi"),
    ("beatriz", "beatriz"),
    ("bouquet", "bouquet"),
    ("camarão", "camara"),
    ("casteli", "casteli"),
    ("chove", "chov"),
    ("colocarão", "colocara"),
    ("concluiriam", "concluiriam"),
    ("contatou", "contatou"),
    ("costurada", "costurad"),
    ("daquilo", "daquil"),
    ("deputado", "deputad"),
    ("desmentir", "desmentir"),
    ("dinossauro", "dinossaur"),
    ("dpz", "dpz"),
    ("emergiu", "emergiu"),
    ("ensangüentado", "ensanguentad"),
    ("esgotado", "esgotad"),
    ("estreitar", "estreitar"),
    ("expus", "expu"),
    ("festejos", "festej"),
    ("fortaleza", "fortalez"),
    ("garrafa", "garraf"),
    ("gravatas", "gravat"),
    ("homossexuais", "homossexual"),
    ("impressionou", "impressionou"),
    ("inibidor", "inibidor"),
    ("ioiô", "ioio"),
    ("justificados", "justificad"),
    ("levantava", "levantav"),
    ("maastricht", "maastricht"),
    ("marluce", "marluc"),
    ("metida", "metid"),
    ("moralista", "moralist"),
    ("negociação", "negociaca"),
    ("ocupado", "ocupad"),
    ("padrinhos", "padrinh"),
    ("pavimentando", "pavimentand"),
    ("pesava", "pesav"),
    ("portes", "port"),
    ("previsões", "previsa"),
    ("psicanálise", "psicanalis"),
    ("rdx", "rdx"),
    ("regulares", "regular"),
    ("resultam", "resultam"),
    ("rozi", "rozi"),
    ("segmentado", "segmentad"),
    ("sinalizar", "sinalizar"),
    ("submete", "submet"),
    ("tarja", "tarj"),
    ("tocadas", "tocad"),
    ("treinada", "treinad"),
    ("valem", "valem"),
    ("vilson", "vilson"),
]


@pytest.mark.parametrize("word,want", GL)
def test_galician(word, want):
    assert galician_stem(word) == want


@pytest.mark.parametrize("word,want", PT_RSLP)
def test_portuguese_rslp(word, want):
    assert portuguese_rslp_stem(word) == want


@pytest.mark.parametrize("word,want", PT_MINIMAL)
def test_portuguese_minimal(word, want):
    assert portuguese_minimal_stem(word) == want


@pytest.mark.parametrize("word,want", PT_LIGHT)
def test_portuguese_light(word, want):
    assert portuguese_light_stem(word) == want


def test_galician_minimal():
    # TestGalicianMinimalStemFilter.java:53-61
    assert galician_minimal_stem("elefantes") == "elefante"
    assert galician_minimal_stem("elefante") == "elefante"
    assert galician_minimal_stem("kalóres") == "kalór"
    assert galician_minimal_stem("kalór") == "kalór"
    # whole-word plural exceptions survive
    assert galician_minimal_stem("mas") == "mas"
    assert galician_minimal_stem("barcelonês") == "barcelonês"


def test_rule_exception_types():
    # whole-word exception (Plural step, flag 1) blocks only ITS rule:
    # "luns" skips ns->n but falls through to the bare s-strip, exactly
    # like the Java first-matching-rule loop (RSLPStemmerBase.java:238)
    assert galician_minimal_stem("luns") == "lun"
    # "pires" is in the s-strip whole-word exceptions, so it survives
    assert galician_minimal_stem("pires") == "pires"
    # plain replacement rule: bons -> bon
    assert galician_minimal_stem("bons") == "bon"


def test_kinds_registry():
    assert set(RSLP_KINDS) == {
        "gl", "gl_minimal", "pt_rslp", "pt_minimal", "pt_light"
    }
    for fn in RSLP_KINDS.values():
        assert fn("") == ""


def test_udf(spark):
    from lucene_spark.analysis.rslp import rslp_stem_udf

    df = spark.createDataFrame([("bonitas",), (None,)], "word string")
    out = df.select(rslp_stem_udf("pt_rslp")("word").alias("s")).collect()
    assert [r.s for r in out] == ["bonit", None]
