"""Snowball stemmer pack (de/fr/es/it/pt/ru/nl/sv/no/da): hand-derived
vectors from the published algorithm definitions, region machinery,
idempotence-ish properties, and the analyzer chains."""

import pytest

from lucene_spark.analysis.snowball import (
    SNOWBALL_LANGS,
    danish_stem,
    dutch_stem,
    french_stem,
    german_stem,
    italian_stem,
    norwegian_stem,
    portuguese_stem,
    russian_stem,
    snowball_analyze,
    snowball_stem,
    spanish_stem,
    swedish_stem,
)

VECTORS = {
    "de": [
        ("aufeinander", "aufeinand"), ("häuser", "haus"), ("katzen", "katz"),
        ("bücher", "buch"), ("größe", "gross"), ("bedeutung", "bedeut"),
        ("arbeiten", "arbeit"), ("möglichkeit", "moglich"),
        # heit is NOT in R2 here (R2 = end of word) -> only umlaut folds
        ("schönheit", "schonheit"),
        ("kategorien", "kategori"), ("verschieden", "verschied"),
    ],
    "es": [
        ("caminando", "camin"), ("canciones", "cancion"), ("grandes", "grand"),
        ("rápidamente", "rapid"), ("felicidad", "felic"),
        ("tomándoselo", "tom"), ("librería", "libr"), ("trabajando", "trabaj"),
        ("importantes", "import"), ("comunicación", "comun"),
        ("universidades", "univers"),
    ],
    "fr": [
        ("continuation", "continu"), ("majestueux", "majestu"),
        ("possibilités", "possibil"), ("heureusement", "heureux"),
        ("nationale", "national"), ("mangé", "mang"), ("mangeront", "mang"),
        ("parlement", "parl"), ("institutions", "institu"),
        ("gouvernement", "gouvern"), ("activités", "activ"),
    ],
    "it": [
        ("abbandonata", "abbandon"), ("nazionale", "nazional"),
        ("possibilità", "possibil"), ("velocemente", "veloc"),
        ("mangiare", "mang"), ("cantando", "cant"),
        ("organizzazione", "organizz"),
    ],
    "pt": [
        ("trabalhando", "trabalh"), ("nacional", "nacional"),
        ("possibilidades", "possibil"), ("rapidamente", "rapid"),
        ("cantou", "cant"), ("meninas", "menin"), ("corações", "coraçõ"),
    ],
    "ru": [
        ("книгами", "книг"), ("важный", "важн"), ("делать", "дела"),
        ("читала", "чита"), ("последовательность", "последовательн"),
        ("большие", "больш"), ("программы", "программ"),
    ],
    "sv": [
        ("bilar", "bil"), ("bilarnas", "bil"), ("flickorna", "flick"),
        ("klokaste", "klok"), ("klubben", "klubb"),
        # heterna strips in step 1, lig in step 3
        ("möjligheterna", "möj"), ("betydelse", "betyd"),
        ("skrivandet", "skriv"), ("vackert", "vackert"),
    ],
    "no": [
        ("havnedistriktene", "havnedistrikt"), ("bilene", "bil"),
        ("mulighetene", "mul"), ("billig", "bil"), ("arbeidet", "arbeid"),
        ("husets", "hus"), ("kastet", "kast"),
    ],
    "da": [
        # els strips in step 3 after the step-1 e/en removal
        ("undersøgelse", "undersøg"), ("indtagelsen", "indtag"),
        # unconditional igst -> ig, then lig in R1
        ("dejligst", "dej"), ("bøgerne", "bøg"),
        ("mulighederne", "mulighed"), ("arbejdet", "arbejd"),
        ("venligst", "ven"), ("hurtigt", "hurt"),
    ],
    "nl": [
        ("lichamelijk", "licham"), ("lichamen", "licham"),
        # step 4 undoubles the vowel in C V V D
        ("lichaam", "licham"), ("opheffen", "opheff"),
        ("opheffing", "opheff"), ("mogelijkheden", "mogelijk"),
        ("belangrijke", "belangrijk"), ("werkende", "werkend"),
        # heid not in R2 (R2 is null) -> untouched
        ("snelheid", "snelheid"),
    ],
}


@pytest.mark.parametrize(
    "lang,word,want",
    [(lg, w, s) for lg, vs in VECTORS.items() for w, s in vs],
)
def test_vectors(lang, word, want):
    assert snowball_stem(lang, word) == want


def test_conflation_classes():
    """Inflected families conflate to one stem — the property retrieval
    actually needs."""
    fams = [
        ("fr", french_stem, ["nation", "nations"]),
        ("fr", french_stem, ["mangé", "mangeront", "manger"]),
        ("es", spanish_stem, ["canción", "canciones"]),
        ("de", german_stem, ["katze", "katzen"]),
        ("it", italian_stem, ["nazionale", "nazionali"]),
        ("pt", portuguese_stem, ["menina", "meninas"]),
        ("ru", russian_stem, ["книга", "книги", "книгами"]),
        ("sv", swedish_stem, ["bil", "bilar", "bilarnas", "bilens"]),
        ("no", norwegian_stem, ["bil", "bilen", "bilene"]),
        ("da", danish_stem, ["bog", "bogen"]),
        ("nl", dutch_stem, ["lichaam", "lichamen", "lichamelijk"]),
    ]
    for lang, fn, words in fams:
        stems = {fn(w) for w in words}
        assert len(stems) == 1, (lang, words, stems)


def test_short_words_pass_through():
    for lang in SNOWBALL_LANGS:
        assert snowball_stem(lang, "ab") in ("ab",)
        assert snowball_stem(lang, "a") == "a"


def test_stem_is_prefix_or_rewrite():
    """Stems never grow beyond word length + 2 (the only growth rules
    are bounded rewrites like eus->eux, ución->u+...)."""
    for lang, vs in VECTORS.items():
        for w, _ in vs:
            assert len(snowball_stem(lang, w)) <= len(w) + 2


def test_deterministic_and_memoized():
    for lang, vs in VECTORS.items():
        for w, s in vs:
            assert snowball_stem(lang, w) == snowball_stem(lang, w) == s


def test_non_target_scripts_pass_through_mostly():
    # a Cyrillic word through the German stemmer has no vowels from the
    # German set -> R1 = end -> untouched
    assert german_stem("книга") == "книга"


def test_analyzer_chain_positions_and_stop():
    an = snowball_analyze("fr")
    toks = an("la continuation des activités nationales")
    # 'la'/'des' are stopwords; positions are pre-stop ordinals
    assert toks == [("continu", 1), ("activ", 3), ("national", 4)]


def test_analyzer_chain_german():
    an = snowball_analyze("de")
    toks = [t for t, _ in an("die Bücher und Katzen")]
    assert toks == ["buch", "katz"]


def test_analyzer_chain_russian():
    an = snowball_analyze("ru")
    toks = [t for t, _ in an("большие книги и программы")]
    assert toks == ["больш", "книг", "программ"]


def test_unknown_language_raises():
    with pytest.raises(ValueError):
        snowball_stem("xx", "word")
