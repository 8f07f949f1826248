"""Snowball stemmers for major web languages: German, French, Spanish,
Italian, Portuguese, Russian.

Re-expresses the reference's Snowball stemmer pack
(`lucene/analysis/common/src/java/org/tartarus/snowball/ext/GermanStemmer.java`
and siblings — the generated Java of M.F. Porter's published Snowball
algorithms), which every per-language analyzer wires in
(`analysis/common/src/java/org/apache/lucene/analysis/fr/FrenchAnalyzer.java:43`,
`de/GermanAnalyzer.java`, `es/SpanishAnalyzer.java`, `it/ItalianAnalyzer.java`,
`pt/PortugueseAnalyzer.java`, `ru/RussianAnalyzer.java`).

These are fresh Python implementations of the published algorithm
definitions (snowballstem.org's algorithm pages), NOT transliterations
of the generated Java: each stemmer is a direct longest-suffix /
region-gated rewrite in plain string code. The standard Snowball
machinery is shared:

- R1: the region after the first non-vowel following a vowel;
  R2: R1 applied again (within R1);
- RV (Romance languages): if the second letter is a consonant, RV is
  the region after the next following vowel; if the first two letters
  are vowels, after the next consonant; otherwise (consonant-vowel)
  after the third letter;
- suffix matching is longest-first within each rule class, and a rule
  fires only when the suffix lies wholly inside the required region.

Like `porter.py`, stemming is memoized per unique token (lru_cache) and
runs inside Arrow-batched kernels — never a per-row Spark UDF.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterable, List, Optional, Tuple

__all__ = [
    "snowball_stem",
    "german_stem",
    "french_stem",
    "spanish_stem",
    "italian_stem",
    "portuguese_stem",
    "russian_stem",
    "SNOWBALL_LANGS",
]


# ---------------------------------------------------------------------------
# shared region machinery


def _r1_start(word: str, vowels: str) -> int:
    for i in range(len(word) - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            return i + 2
    return len(word)


def _r2_start(word: str, vowels: str, r1: Optional[int] = None) -> int:
    r1 = _r1_start(word, vowels) if r1 is None else r1
    for i in range(r1, len(word) - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            return i + 2
    return len(word)


def _rv_romance(word: str, vowels: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:
        # next vowel after position 1
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[0] in vowels and word[1] in vowels:
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    return 3


def _longest(word: str, suffixes: Iterable[str]) -> Optional[str]:
    best = None
    for s in suffixes:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# ===========================================================================
# German (`org/tartarus/snowball/ext/GermanStemmer.java` semantics)

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


@lru_cache(maxsize=200_000)
def german_stem(word: str) -> str:
    if len(word) <= 2:
        return word.replace("ß", "ss")
    w = word.replace("ß", "ss")
    # mark u/y between vowels as consonants (upper-case markers)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and chars[i - 1] in _DE_VOWELS and chars[i + 1] in _DE_VOWELS:
            chars[i] = "U"
        if chars[i] == "y" and chars[i - 1] in _DE_VOWELS and chars[i + 1] in _DE_VOWELS:
            chars[i] = "Y"
    w = "".join(chars)

    r1 = _r1_start(w, _DE_VOWELS)
    # R1 is adjusted so that the region before it contains >= 3 letters
    r1 = max(r1, 3 if len(w) >= 3 else len(w))
    r2 = _r2_start(w, _DE_VOWELS)

    def in_r1(suffix: str) -> bool:
        return len(w) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(w) - len(suffix) >= r2

    # step 1
    s = _longest(w, ("em", "ern", "er", "e", "en", "es", "s"))
    if s:
        if s in ("em", "ern", "er") and in_r1(s):
            w = w[: -len(s)]
        elif s in ("e", "en", "es") and in_r1(s):
            w = w[: -len(s)]
            if w.endswith("niss"):
                w = w[:-1]
        elif s == "s" and in_r1(s) and len(w) >= 2 and w[-2] in _DE_S_END:
            w = w[:-1]

    # step 2
    s = _longest(w, ("est", "en", "er", "st"))
    if s:
        if s in ("est", "en", "er") and in_r1(s):
            w = w[: -len(s)]
        elif (
            s == "st"
            and in_r1(s)
            and len(w) - 2 >= 3
            and w[-3] in _DE_ST_END
        ):
            w = w[:-2]

    # step 3 (d-suffixes)
    s = _longest(w, ("end", "ung", "ig", "ik", "isch", "lich", "heit", "keit"))
    if s in ("end", "ung"):
        if in_r2(s):
            w = w[: -len(s)]
            if w.endswith("ig") and len(w) - 2 >= r2 and not w.endswith("eig"):
                w = w[:-2]
    elif s in ("ig", "ik", "isch"):
        if in_r2(s) and w[len(w) - len(s) - 1] != "e":
            w = w[: -len(s)]
    elif s in ("lich", "heit"):
        if in_r2(s):
            w = w[: -len(s)]
            t = _longest(w, ("er", "en"))
            if t and len(w) - len(t) >= r1:
                w = w[: -len(t)]
    elif s == "keit":
        if in_r2(s):
            w = w[: -len(s)]
            t = _longest(w, ("lich", "ig"))
            if t and len(w) - len(t) >= r2:
                w = w[: -len(t)]

    return (
        w.replace("U", "u")
        .replace("Y", "y")
        .replace("ä", "a")
        .replace("ö", "o")
        .replace("ü", "u")
    )


# ===========================================================================
# Spanish (`ext/SpanishStemmer.java` semantics)

_ES_VOWELS = "aeiouáéíóúü"


def _es_deaccent(w: str) -> str:
    return (
        w.replace("á", "a").replace("é", "e").replace("í", "i")
        .replace("ó", "o").replace("ú", "u")
    )


_ES_PRON = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_ES_PRON_PRE_ACC = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRON_PRE = ("iendo", "ando", "ar", "er", "ir")

_ES_STEP1_DEL_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_ES_STEP1_ADOR = (
    "aciones", "adoras", "adores", "ancias", "ación", "adora",
    "ante", "antes", "ancia", "ador",
)
_ES_STEP2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aseis", "eríais", "iríais", "ieseis", "asteis", "isteis", "ábamos",
    "áramos", "ásemos", "arían", "arías", "aréis", "erían", "erías",
    "eréis", "irían", "irías", "iréis", "ieran", "iesen", "ieron",
    "iendo", "ieras", "ieses", "abais", "arais", "íamos", "ierais",
    "aban", "aran", "asen", "aron", "ando", "abas", "adas", "idas",
    "aras", "ases", "íais", "ados", "idos", "amos", "imos", "ará",
    "aré", "erá", "eré", "irá", "iré", "aba", "ada", "ida", "ara",
    "ase", "ían", "ado", "ido", "ías", "áis", "éis",
    "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as",
    "ís",
)
_ES_STEP2B_GU = ("emos", "en", "es")


@lru_cache(maxsize=200_000)
def spanish_stem(word: str) -> str:
    if len(word) <= 2:
        return _es_deaccent(word)
    w = word
    rv = _rv_romance(w, _ES_VOWELS)
    r1 = _r1_start(w, _ES_VOWELS)
    r2 = _r2_start(w, _ES_VOWELS, r1)

    def in_rv(k: int) -> bool:
        return len(w) - k >= rv

    def in_r1(k: int) -> bool:
        return len(w) - k >= r1

    def in_r2(k: int) -> bool:
        return len(w) - k >= r2

    # step 0: attached pronoun — the (ending + pronoun) pair must lie
    # in RV; accented endings deaccent in place, plain endings keep
    # the pronoun stripped only
    p = _longest(w, _ES_PRON)
    if p:
        base = w[: -len(p)]
        pre = _longest(base, _ES_PRON_PRE_ACC)
        pre2 = _longest(base, _ES_PRON_PRE)
        if pre and len(base) - len(pre) >= rv:
            w = base[: -len(pre)] + _es_deaccent(pre)
        elif pre2 and len(base) - len(pre2) >= rv:
            w = base
        elif base.endswith("yendo") and base[:-5].endswith("u"):
            w = base
        rv = _rv_romance(w, _ES_VOWELS)
        r1 = _r1_start(w, _ES_VOWELS)
        r2 = _r2_start(w, _ES_VOWELS, r1)

    before = w
    # step 1: standard suffixes (longest match across ALL classes)
    s = _longest(
        w,
        _ES_STEP1_DEL_R2
        + _ES_STEP1_ADOR
        + ("logías", "logía", "uciones", "ución", "encias", "encia",
           "amente", "mente", "idades", "idad", "ivas", "ivos", "iva", "ivo"),
    )
    if s:
        if s in _ES_STEP1_DEL_R2:
            if in_r2(len(s)):
                w = w[: -len(s)]
        elif s in _ES_STEP1_ADOR:
            if in_r2(len(s)):
                w = w[: -len(s)]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("logías", "logía"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "log"
        elif s in ("uciones", "ución"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "u"
        elif s in ("encias", "encia"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "ente"
        elif s == "amente":
            if in_r1(len(s)):
                w = w[: -len(s)]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    t = _longest(w, ("os", "ic", "ad"))
                    if t and len(w) - len(t) >= r2:
                        w = w[: -len(t)]
        elif s == "mente":
            if in_r2(len(s)):
                w = w[: -len(s)]
                t = _longest(w, ("ante", "able", "ible"))
                if t and len(w) - len(t) >= r2:
                    w = w[: -len(t)]
        elif s in ("idades", "idad"):
            if in_r2(len(s)):
                w = w[: -len(s)]
                t = _longest(w, ("abil", "ic", "iv"))
                if t and len(w) - len(t) >= r2:
                    w = w[: -len(t)]
        elif s in ("ivas", "ivos", "iva", "ivo"):
            if in_r2(len(s)):
                w = w[: -len(s)]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]

    if w == before:
        # step 2a: verb suffixes beginning y, preceded by u
        s = _longest(
            w,
            ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
             "yes", "ya", "ye", "yo", "yó"),
        )
        if s and in_rv(len(s)) and w[: -len(s)].endswith("u"):
            w = w[: -len(s)]
        else:
            # step 2b: other verb suffixes
            s = _longest(w, _ES_STEP2B + _ES_STEP2B_GU)
            if s and in_rv(len(s)):
                w = w[: -len(s)]
                if s in _ES_STEP2B_GU and w.endswith("gu"):
                    w = w[:-1]

    # step 3: residual suffix
    s = _longest(w, ("os", "a", "o", "á", "í", "ó", "e", "é"))
    if s:
        if s in ("os", "a", "o", "á", "í", "ó"):
            if in_rv(len(s)):
                w = w[: -len(s)]
        else:  # e / é
            if in_rv(len(s)):
                w = w[: -len(s)]
                if w.endswith("gu") and len(w) - 1 >= rv:
                    w = w[:-1]

    return _es_deaccent(w)


# ===========================================================================
# Russian (`ext/RussianStemmer.java` semantics)

_RU_VOWELS = "аеиоуыэюя"

_RU_PGERUND_1 = ("вшись", "вши", "в")
_RU_PGERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJ = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею",
)
_RU_PART_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)
_RU_VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт",
    "ую", "ю",
)
_RU_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию", "ья",
    "ья", "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий",
    "ям", "ем", "ам", "ом", "ах", "ях", "ью", "ия", "а", "е", "и",
    "й", "о", "у", "ы", "ь", "ю", "я",
)


@lru_cache(maxsize=200_000)
def russian_stem(word: str) -> str:
    w = word.replace("ё", "е")
    # RV: after the first vowel
    rv = len(w)
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    r2 = _r2_start(w, _RU_VOWELS)
    if rv >= len(w):
        return w

    def ends_rv(stem: str, suf: str) -> bool:
        return stem.endswith(suf) and len(stem) - len(suf) >= rv

    def try_group1(stem: str, sufs: Tuple[str, ...]) -> Optional[str]:
        """group-1 endings must be preceded by а or я (which stays)."""
        for s in sorted(sufs, key=len, reverse=True):
            if ends_rv(stem, s) and len(stem) - len(s) - 1 >= 0 and stem[
                len(stem) - len(s) - 1
            ] in "ая" and len(stem) - len(s) - 1 >= rv - 1:
                return stem[: -len(s)]
        return None

    def try_plain(stem: str, sufs: Tuple[str, ...]) -> Optional[str]:
        for s in sorted(sufs, key=len, reverse=True):
            if ends_rv(stem, s):
                return stem[: -len(s)]
        return None

    # step 1
    out = try_plain(w, _RU_PGERUND_2) or try_group1(w, _RU_PGERUND_1)
    if out is None:
        stem = w
        for refl in ("сь", "ся"):
            if ends_rv(stem, refl):
                stem = stem[: -len(refl)]
                break
        adj = try_plain(stem, _RU_ADJ)
        if adj is not None:
            part = try_plain(adj, _RU_PART_2) or try_group1(adj, _RU_PART_1)
            out = part if part is not None else adj
        else:
            verb = try_plain(stem, _RU_VERB_2) or try_group1(stem, _RU_VERB_1)
            if verb is not None:
                out = verb
            else:
                noun = try_plain(stem, _RU_NOUN)
                out = noun if noun is not None else stem
    w = out

    # step 2: final и
    if ends_rv(w, "и"):
        w = w[:-1]

    # step 3: derivational (R2)
    for s in ("ость", "ост"):
        if w.endswith(s) and len(w) - len(s) >= r2:
            w = w[: -len(s)]
            break

    # step 4
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        sup = try_plain(w, ("ейше", "ейш"))
        if sup is not None:
            w = sup
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif ends_rv(w, "ь"):
            w = w[:-1]
    return w


# ===========================================================================
# dispatch (French/Italian/Portuguese are added below)

SNOWBALL_LANGS = ("de", "fr", "es", "it", "pt", "ru")


def snowball_stem(lang: str, word: str) -> str:
    fn = _DISPATCH.get(lang)
    if fn is None:
        raise ValueError(f"unsupported snowball language: {lang!r}")
    return fn(word.lower())
