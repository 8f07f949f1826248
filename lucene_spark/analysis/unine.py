"""UniNE/CLEF light + minimal stemmers for German, Spanish, French,
Italian, Russian, Swedish and Norwegian.

Re-expresses the reference's per-language hand-rolled light stemmers
(Savoy, "Light Stemming Approaches for the French, Portuguese, German
and Hungarian Languages", SAC 2006, and the UniNE CLEF reports):

- ``german_light_stem``     — de/GermanLightStemmer.java:41
- ``german_minimal_stem``   — de/GermanMinimalStemmer.java:41
- ``spanish_light_stem``    — es/SpanishLightStemmer.java:41
- ``spanish_minimal_stem``  — es/SpanishMinimalStemmer.java:41
- ``spanish_plural_stem``   — es/SpanishPluralStemmer.java:41
- ``french_light_stem``     — fr/FrenchLightStemmer.java:41
- ``french_minimal_stem``   — fr/FrenchMinimalStemmer.java:41
- ``italian_light_stem``    — it/ItalianLightStemmer.java:41
- ``russian_light_stem``    — ru/RussianLightStemmer.java:41
- ``swedish_light_stem``    — sv/SwedishLightStemmer.java:41
- ``swedish_minimal_stem``  — sv/SwedishMinimalStemmer.java:41
- ``norwegian_light_stem``  — no/NorwegianLightStemmer.java:45
- ``norwegian_minimal_stem``— no/NorwegianMinimalStemmer.java:47

Each is a faithful rule-for-rule translation including the quirks
(e.g. the Spanish plural stemmer's ``q ||`` precedence, the French
light normalizer's consecutive-duplicate collapse). de/es/fr/it/ru/sv
light + de-minimal, fr-minimal and es-plural are validated against the
COMPLETE reference vocabulary archives (delighttestdata.zip etc.) —
see tests/test_unine.py for the replay counts.

Scale shape: pure per-token functions, memoized, applied inside
Arrow-batched UDFs — one narrow projection, no shuffle.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

__all__ = [
    "german_light_stem",
    "german_minimal_stem",
    "spanish_light_stem",
    "spanish_minimal_stem",
    "spanish_plural_stem",
    "french_light_stem",
    "french_minimal_stem",
    "italian_light_stem",
    "russian_light_stem",
    "swedish_light_stem",
    "swedish_minimal_stem",
    "norwegian_light_stem",
    "norwegian_minimal_stem",
    "UNINE_KINDS",
    "unine_stem_udf",
]


# ---------------------------------------------------------------------------
# German

_DE_LIGHT_FOLD = str.maketrans(
    {"ä": "a", "à": "a", "á": "a", "â": "a",
     "ö": "o", "ò": "o", "ó": "o", "ô": "o",
     "ï": "i", "ì": "i", "í": "i", "î": "i",
     "ü": "u", "ù": "u", "ú": "u", "û": "u"}
)

_DE_ST_ENDING = frozenset("bdfghklmnt")


@lru_cache(maxsize=200_000)
def german_light_stem(word: str) -> str:
    """GermanLightStemmer.java:43: umlaut/accent fold, then the two
    plural/case suffix passes (step1: -ern/-e[mnrs]/-e/-s-after-stEnd;
    step2: -est/-er/-en/-st-after-stEnd)."""
    w = word.translate(_DE_LIGHT_FOLD)
    n = len(w)
    # step1
    if n > 5 and w.endswith("ern"):
        w = w[:-3]; n -= 3
    elif n > 4 and n >= 2 and w[n - 2] == "e" and w[n - 1] in "mnrs":
        w = w[:-2]; n -= 2
    elif n > 3 and w.endswith("e"):
        w = w[:-1]; n -= 1
    elif n > 3 and w.endswith("s") and n >= 2 and w[n - 2] in _DE_ST_ENDING:
        w = w[:-1]; n -= 1
    # step2
    if n > 5 and w.endswith("est"):
        w = w[:-3]
    elif n > 4 and (w.endswith("er") or w.endswith("en")):
        w = w[:-2]
    elif n > 4 and w.endswith("st") and n >= 3 and w[n - 3] in _DE_ST_ENDING:
        w = w[:-2]
    return w


_DE_MIN_FOLD = str.maketrans({"ä": "a", "ö": "o", "ü": "u"})


@lru_cache(maxsize=200_000)
def german_minimal_stem(word: str) -> str:
    """GermanMinimalStemmer.java:43: umlaut fold gated on len ≥ 5,
    then -nen, then -en/-se/-es/-er, then single n/e/s/r."""
    if len(word) < 5:
        return word
    w = word.translate(_DE_MIN_FOLD)
    n = len(w)
    if n > 6 and w.endswith("nen"):
        return w[:-3]
    if n > 5:
        last, prev = w[-1], w[-2]
        if (
            (last == "n" and prev == "e")
            or (last == "e" and prev == "s")
            or (last == "s" and prev == "e")
            or (last == "r" and prev == "e")
        ):
            return w[:-2]
    if w[-1] in "nesr":
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Spanish

_ES_FOLD = str.maketrans(
    {"à": "a", "á": "a", "â": "a", "ä": "a",
     "ò": "o", "ó": "o", "ô": "o", "ö": "o",
     "è": "e", "é": "e", "ê": "e", "ë": "e",
     "ù": "u", "ú": "u", "û": "u", "ü": "u",
     "ì": "i", "í": "i", "î": "i", "ï": "i"}
)


@lru_cache(maxsize=200_000)
def spanish_light_stem(word: str) -> str:
    """SpanishLightStemmer.java:43: accent fold (len ≥ 5), strip one
    final o/a/e, or -es (with ces→z recode and -eses keeping -es)."""
    if len(word) < 5:
        return word
    w = word.translate(_ES_FOLD)
    n = len(w)
    last = w[-1]
    if last in "oae":
        return w[:-1]
    if last == "s":
        if w[n - 2] == "e" and w[n - 3] == "s" and w[n - 4] == "e":
            return w[:-2]
        if w[n - 2] == "e" and w[n - 3] == "c":
            return w[: n - 3] + "z"
        if w[n - 2] in "oae":
            return w[:-2]
    return w


_ES_MIN_FOLD = str.maketrans(
    {"à": "a", "á": "a", "â": "a", "ä": "a",
     "ò": "o", "ó": "o", "ô": "o", "ö": "o",
     "è": "e", "é": "e", "ê": "e", "ë": "e",
     "ù": "u", "ú": "u", "û": "u", "ü": "u",
     "ì": "i", "í": "i", "î": "i", "ï": "i",
     "ñ": "n"}
)


@lru_cache(maxsize=200_000)
def spanish_minimal_stem(word: str) -> str:
    """SpanishMinimalStemmer.java:43 — plural-s removal only."""
    if len(word) < 4 or not word.endswith("s"):
        return word
    w = word.translate(_ES_MIN_FOLD)
    n = len(w)
    prev = w[n - 2]
    if prev in "ao":
        return w[:-1]
    if prev == "e":
        if w[n - 3] == "s" and w[n - 4] == "e":
            return w[:-2]
        if w[n - 3] == "c":
            return w[: n - 3] + "z"
        return w[:-2]
    return w[:-1]


# SpanishPluralStemmer.java:45 invariant + special word sets
_ES_INVARIANTS = frozenset("""abrebotellas abrecartas abrelatas afueras
albatros albricias aledaños alexis alicates analisis andurriales
antitesis añicos apendicitis apocalipsis arcoiris aries bilis boletus
boris brindis cactus canutas caries cascanueces cascarrabias ciempies
cifosis cortaplumas corpus cosmos cosquillas creces crisis
cuatrocientas cuatrocientos cuelgacapas cuentacuentos cuentapasos
cumpleaños doscientas doscientos dosis enseres entonces esponsales
estatus exequias fauces forceps fotosintesis gafas gafotas gargaras
gris honorarios ictus jueves lapsus lavacoches lavaplatos limpiabotas
lunes maitines martes mondadientes novecientas novecientos nupcias
ochocientas ochocientos pais paris parabrisas paracaidas parachoques
paraguas pararrayos pisapapeles piscis portaaviones portamaletas
portamantas quinientas quinientos quitamanchas recogepelotas rictus
rompeolas sacacorchos sacapuntas saltamontes salvavidas seis
seiscientas seiscientos setecientas setecientos sintesis tenis tifus
trabalenguas vacaciones venus versus viacrucis virus viveres
volandas""".split())

_ES_SPECIAL = frozenset("""yoes noes sies clubes faralaes albalaes
itemes albumes sandwiches relojes bojes contrarreloj
carcajes""".split())

_ES_VOWELS = frozenset("aeiou")


@lru_cache(maxsize=200_000)
def spanish_plural_stem(word: str) -> str:
    """SpanishPluralStemmer.java:164 — the rule cascade verbatim,
    including the source's ``q || (g && u && [ie])`` precedence (a
    bare q at position len-4 short-circuits the whole condition)."""
    if len(word) < 4:
        return word
    w = word.translate(_ES_FOLD)
    n = len(w)
    if w in _ES_INVARIANTS:
        return w
    if w in _ES_SPECIAL:
        return w[:-2]
    if w[-1] == "s":
        if w[n - 2] not in _ES_VOWELS:
            return w[:-1]
        if w[n - 4] == "q" or (
            w[n - 4] == "g" and w[n - 3] == "u" and w[n - 2] in "ie"
        ):
            return w[:-1]
        if w[n - 4] in _ES_VOWELS and w[n - 3] == "r" and w[n - 2] == "e":
            return w[:-2]
        if (
            w[n - 4] in _ES_VOWELS
            and w[n - 3] in "dlnx"
            and w[n - 2] == "e"
        ):
            return w[:-2]
        if w[n - 3] in "yu" and w[n - 2] == "e":
            return w[:-2]
        if w[n - 4] in "ulrtn" and w[n - 3] == "i" and w[n - 2] == "e":
            return w[:-2]
        if w[n - 3] == "s" and w[n - 2] == "e":
            return w[:-2]
        if w[n - 3] in _ES_VOWELS and w[n - 2] == "i":
            return w[: n - 2] + "y"
        if w[n - 3] == "d" and w[n - 2] == "i":
            return w[: n - 2] + "y"
        if w[n - 2] == "e" and w[n - 3] == "c":
            return w[: n - 3] + "z"
        if w[n - 2] in _ES_VOWELS:
            return w[:-1]
    return w


# ---------------------------------------------------------------------------
# French

_FR_FOLD = {
    "à": "a", "á": "a", "â": "a",
    "ô": "o",
    "è": "e", "é": "e", "ê": "e",
    "ù": "u", "û": "u",
    "î": "i",
    "ç": "c",
}


def _fr_norm(s: list, n: int) -> str:
    """FrenchLightStemmer.java:150 norm: fold accents, collapse
    consecutive duplicate letters, strip -ie, then r/e/e and a final
    double letter — each strip gated on len > 4."""
    if n > 4:
        for i in range(n):
            s[i] = _FR_FOLD.get(s[i], s[i])
        i, ch = 1, s[0]
        while i < n:
            if s[i] == ch and ch.isalpha():
                del s[i]
                n -= 1
            else:
                ch = s[i]
                i += 1
    if n > 4 and s[n - 2] == "i" and s[n - 1] == "e":
        n -= 2
    if n > 4:
        if s[n - 1] == "r":
            n -= 1
        if s[n - 1] == "e":
            n -= 1
        if s[n - 1] == "e":
            n -= 1
        if s[n - 1] == s[n - 2] and s[n - 1].isalpha():
            n -= 1
    return "".join(s[:n])


@lru_cache(maxsize=200_000)
def french_light_stem(word: str) -> str:
    """FrenchLightStemmer.java:43 — the full derivational-suffix
    cascade (x/s plurals, -issement→ir, -ficatrice→fier,
    -cateur→quer, -trice→teur, folle/molle→fou/mou, …), each branch
    ending in the norm pass."""
    s = list(word)
    n = len(s)

    def ew(suf: str) -> bool:
        return n >= len(suf) and s[n - len(suf) : n] == list(suf)

    if n > 5 and s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u" and s[n - 4] != "e":
            s[n - 2] = "l"
        n -= 1
    if n > 3 and s[n - 1] == "x":
        n -= 1
    if n > 3 and s[n - 1] == "s":
        n -= 1

    if n > 9 and ew("issement"):
        n -= 6
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 8 and ew("issant"):
        n -= 4
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 6 and ew("ement"):
        n -= 4
        if n > 3 and s[n - 3 : n] == list("ive"):
            n -= 1
            s[n - 1] = "f"
        return _fr_norm(s, n)
    if n > 11 and ew("ficatrice"):
        n -= 5
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 10 and ew("ficateur"):
        n -= 4
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 9 and ew("catrice"):
        n -= 3
        s[n - 4] = "q"
        s[n - 3] = "u"
        s[n - 2] = "e"
        return _fr_norm(s, n)
    if n > 8 and ew("cateur"):
        n -= 2
        s[n - 4] = "q"
        s[n - 3] = "u"
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 8 and ew("atrice"):
        n -= 4
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 7 and ew("ateur"):
        n -= 3
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 6 and ew("trice"):
        n -= 1
        s[n - 3] = "e"
        s[n - 2] = "u"
        s[n - 1] = "r"
        # no return — falls through, like the source
    if n > 5 and ew("ième"):
        return _fr_norm(s, n - 4)
    if n > 7 and ew("teuse"):
        n -= 2
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 6 and ew("teur"):
        n -= 1
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 5 and ew("euse"):
        return _fr_norm(s, n - 2)
    if n > 8 and ew("ère"):
        n -= 1
        s[n - 2] = "e"
        return _fr_norm(s, n)
    if n > 7 and ew("ive"):
        n -= 1
        s[n - 1] = "f"
        return _fr_norm(s, n)
    if n > 4 and (ew("folle") or ew("molle")):
        n -= 2
        s[n - 1] = "u"
        return _fr_norm(s, n)
    if n > 9 and ew("nnelle"):
        return _fr_norm(s, n - 5)
    if n > 9 and ew("nnel"):
        return _fr_norm(s, n - 3)
    if n > 4 and ew("ète"):
        n -= 1
        s[n - 2] = "e"
        # falls through
    if n > 8 and ew("ique"):
        n -= 4
        # falls through
    if n > 8 and ew("esse"):
        return _fr_norm(s, n - 3)
    if n > 7 and ew("inage"):
        return _fr_norm(s, n - 3)
    if n > 9 and ew("isation"):
        n -= 7
        if n > 5 and s[n - 3 : n] == list("ual"):
            s[n - 2] = "e"
        return _fr_norm(s, n)
    if n > 9 and ew("isateur"):
        return _fr_norm(s, n - 7)
    if n > 8 and ew("ation"):
        return _fr_norm(s, n - 5)
    if n > 8 and ew("ition"):
        return _fr_norm(s, n - 5)
    return _fr_norm(s, n)


@lru_cache(maxsize=200_000)
def french_minimal_stem(word: str) -> str:
    """FrenchMinimalStemmer.java:42: aux→al, then s/r/e/é strips and a
    final double-letter collapse, all only for words ≥ 6 chars."""
    if len(word) < 6:
        return word
    s = list(word)
    n = len(s)
    if s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u":
            s[n - 2] = "l"
        return "".join(s[: n - 1])
    if s[n - 1] == "s":
        n -= 1
    if s[n - 1] == "r":
        n -= 1
    if s[n - 1] == "e":
        n -= 1
    if s[n - 1] == "é":
        n -= 1
    if s[n - 1] == s[n - 2] and s[n - 1].isalpha():
        n -= 1
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Italian

@lru_cache(maxsize=200_000)
def italian_light_stem(word: str) -> str:
    """ItalianLightStemmer.java:43: accent fold (len ≥ 6) then one
    final-vowel strip, two chars for the i/h-linked plurals."""
    if len(word) < 6:
        return word
    w = word.translate(_ES_FOLD)
    n = len(w)
    last, prev = w[-1], w[-2]
    if last == "e":
        return w[:-2] if prev in "ih" else w[:-1]
    if last == "i":
        return w[:-2] if prev in "hi" else w[:-1]
    if last == "a":
        return w[:-2] if prev == "i" else w[:-1]
    if last == "o":
        return w[:-2] if prev == "i" else w[:-1]
    return w


# ---------------------------------------------------------------------------
# Russian

_RU_4 = ("иями", "оями")
_RU_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
         "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
         "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
         "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


@lru_cache(maxsize=200_000)
def russian_light_stem(word: str) -> str:
    """RussianLightStemmer.java:43: case-ending removal (4/3/2/1-char
    tiers) then ь/и/нн normalization."""
    w = word
    n = len(w)
    if n > 6 and w.endswith(_RU_4):
        w = w[:-4]
    elif n > 5 and w.endswith(_RU_3):
        w = w[:-3]
    elif n > 4 and w.endswith(_RU_2):
        w = w[:-2]
    elif n > 3 and w[-1] in "аеиоуйыяь":
        w = w[:-1]
    n = len(w)
    if n > 3:
        if w[-1] in "ьи":
            return w[:-1]
        if w[-1] == "н" and w[-2] == "н":
            return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Swedish

@lru_cache(maxsize=200_000)
def swedish_light_stem(word: str) -> str:
    """SwedishLightStemmer.java:43."""
    w = word
    n = len(w)
    if n > 4 and w[-1] == "s":
        w = w[:-1]; n -= 1
    if n > 7 and (w.endswith("elser") or w.endswith("heten")):
        return w[:-5]
    if n > 6 and w.endswith(
        ("arne", "erna", "ande", "else", "aste", "orna", "aren")
    ):
        return w[:-4]
    if n > 5 and w.endswith(("are", "ast", "het")):
        return w[:-3]
    if n > 4 and w.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return w[:-2]
    if n > 3 and w[-1] in "taen":
        return w[:-1]
    return w


@lru_cache(maxsize=200_000)
def swedish_minimal_stem(word: str) -> str:
    """SwedishMinimalStemmer.java:42."""
    w = word
    n = len(w)
    if n > 4 and w[-1] == "s":
        w = w[:-1]; n -= 1
    if n > 6 and w.endswith(("arne", "erna", "arna", "orna", "aren")):
        return w[:-4]
    if n > 5 and w.endswith("are"):
        return w[:-3]
    if n > 4 and w.endswith(("ar", "at", "er", "et", "or", "en")):
        return w[:-2]
    if n > 3 and w[-1] in "aen":
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Norwegian (flags: bokmål and/or nynorsk, NorwegianLightStemmer.java:31)

BOKMAAL = 1
NYNORSK = 2


def norwegian_light_stem(word: str, flags: int = BOKMAAL) -> str:
    """NorwegianLightStemmer.java:69 with the bokmål/nynorsk gating."""
    if flags <= 0 or flags > BOKMAAL + NYNORSK:
        raise ValueError("invalid flags")
    bm = bool(flags & BOKMAAL)
    nn = bool(flags & NYNORSK)
    w = word
    n = len(w)
    if n > 4 and w[-1] == "s":
        w = w[:-1]; n -= 1
    if n > 7 and (
        (w.endswith("heter") and bm)
        or (w.endswith("heten") and bm)
        or (w.endswith("heita") and nn)
    ):
        return w[:-5]
    if n > 8 and nn and w.endswith(("heiter", "leiken", "leikar")):
        return w[:-6]
    if n > 5 and (w.endswith("dom") or (w.endswith("het") and bm)):
        return w[:-3]
    if n > 6 and nn and w.endswith(("heit", "semd", "leik")):
        return w[:-4]
    if n > 7 and w.endswith(("elser", "elsen")):
        return w[:-5]
    if n > 6 and (
        (w.endswith("ende") and bm)
        or (w.endswith("ande") and nn)
        or w.endswith("else")
        or (w.endswith("este") and bm)
        or (w.endswith("aste") and nn)
        or (w.endswith("eren") and bm)
        or (w.endswith("aren") and nn)
    ):
        return w[:-4]
    if n > 5 and (
        (w.endswith("ere") and bm)
        or (w.endswith("are") and nn)
        or (w.endswith("est") and bm)
        or (w.endswith("ast") and nn)
        or w.endswith("ene")
        or (w.endswith("ane") and nn)
    ):
        return w[:-3]
    if n > 4 and (
        w.endswith(("er", "en", "et"))
        or (w.endswith("ar") and nn)
        or (w.endswith("st") and bm)
        or w.endswith("te")
    ):
        return w[:-2]
    if n > 3 and w[-1] in "aen":
        return w[:-1]
    return w


def norwegian_minimal_stem(word: str, flags: int = BOKMAAL) -> str:
    """NorwegianMinimalStemmer.java:66."""
    if flags <= 0 or flags > BOKMAAL + NYNORSK:
        raise ValueError("invalid flags")
    nn = bool(flags & NYNORSK)
    w = word
    n = len(w)
    if n > 4 and w[-1] == "s":
        w = w[:-1]; n -= 1
    if n > 5 and (w.endswith("ene") or (w.endswith("ane") and nn)):
        return w[:-3]
    if n > 4 and (
        w.endswith(("er", "en", "et")) or (w.endswith("ar") and nn)
    ):
        return w[:-2]
    if n > 3 and w[-1] in "ae":
        return w[:-1]
    return w


UNINE_KINDS = {
    "de_light": german_light_stem,
    "de_minimal": german_minimal_stem,
    "es_light": spanish_light_stem,
    "es_minimal": spanish_minimal_stem,
    "es_plural": spanish_plural_stem,
    "fr_light": french_light_stem,
    "fr_minimal": french_minimal_stem,
    "it_light": italian_light_stem,
    "ru_light": russian_light_stem,
    "sv_light": swedish_light_stem,
    "sv_minimal": swedish_minimal_stem,
    "no_light": norwegian_light_stem,
    "no_minimal": norwegian_minimal_stem,
}


def unine_stem_udf(kind: str):
    """Arrow-batched stem column: string → string (memoized per unique
    token). One narrow projection — no shuffle, no extra stage."""
    from pyspark.sql.functions import pandas_udf

    fn = UNINE_KINDS[kind]

    @pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(lambda t: fn(t) if isinstance(t, str) else t)

    return _stem
