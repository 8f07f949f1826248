"""Snowball stemmers for major web languages: German, French, Spanish,
Italian, Portuguese, Russian, Dutch, Swedish, Norwegian, Danish.

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

import pandas as pd

__all__ = [
    "snowball_stem",
    "german_stem",
    "french_stem",
    "spanish_stem",
    "italian_stem",
    "portuguese_stem",
    "russian_stem",
    "dutch_stem",
    "swedish_stem",
    "norwegian_stem",
    "danish_stem",
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
    "aré", "erá", "eré", "irá", "iré", "aría", "ería", "iría",
    "iera", "iese", "aste", "iste", "aba", "ada", "ida", "ara",
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
# French (`ext/FrenchStemmer.java` semantics)

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _fr_mark(w: str) -> str:
    """Prelude: u/i between vowels, y next to a vowel, and u after q
    become upper-case markers (treated as non-vowels)."""
    ch = list(w)
    n = len(ch)
    for i in range(n):
        c = ch[i]
        prev_v = i > 0 and ch[i - 1].lower() in _FR_VOWELS and ch[i - 1].islower()
        next_v = i + 1 < n and ch[i + 1].lower() in _FR_VOWELS and ch[i + 1].islower()
        if c == "y" and (prev_v or next_v):
            ch[i] = "Y"
        elif c == "u" and i > 0 and ch[i - 1] == "q":
            ch[i] = "U"
        elif c in "ui" and prev_v and next_v:
            ch[i] = c.upper()
    return "".join(ch)


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 3 and (
        (w[0] in _FR_VOWELS and w[1] in _FR_VOWELS)
        or w[:3] in ("par", "col", "tap")
    ):
        return 3
    # region after the first vowel not at the start
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return i + 1
    return n


_FR_STEP1_R2_DEL = (
    "ances", "iqUes", "ismes", "ables", "istes",
    "ance", "iqUe", "isme", "able", "iste", "eux",
)
_FR_ATEUR = ("atrices", "atrice", "ateurs", "ations", "ateur", "ation")
_FR_2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
    "ies", "ira", "ît", "ie", "ir", "is", "it", "i",
)
_FR_2B_ER = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
)
_FR_2B_A = (
    "assions", "assent", "assiez", "aIent", "antes", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "ât",
    "ai", "as", "a",
)


@lru_cache(maxsize=200_000)
def french_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = _fr_mark(word)
    rv = _fr_rv(w)
    r1 = _r1_start(w, _FR_VOWELS)
    r2 = _r2_start(w, _FR_VOWELS, r1)

    def in_rv(k: int) -> bool:
        return len(w) - k >= rv

    def in_r1(k: int) -> bool:
        return len(w) - k >= r1

    def in_r2(k: int) -> bool:
        return len(w) - k >= r2

    changed = False
    do_2a = False
    pre = w

    # ---- step 1: standard suffixes (longest match)
    s = _longest(
        w,
        _FR_STEP1_R2_DEL + _FR_ATEUR + (
            "logies", "logie", "usions", "utions", "usion", "ution",
            "ences", "ence", "ements", "ement", "ités", "ité",
            "ives", "ifs", "ive", "if", "eaux", "aux", "euses", "euse",
            "issements", "issement", "amment", "emment", "ments", "ment",
        ),
    )
    if s:
        if s in _FR_STEP1_R2_DEL:
            if in_r2(len(s)):
                w = w[: -len(s)]
        elif s in _FR_ATEUR:
            if in_r2(len(s)):
                w = w[: -len(s)]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif s in ("logies", "logie"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "log"
        elif s in ("usions", "utions", "usion", "ution"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "u"
        elif s in ("ences", "ence"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "ent"
        elif s in ("ements", "ement"):
            if in_rv(len(s)):
                w = w[: -len(s)]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif w.endswith("eus"):
                    if len(w) - 3 >= r2:
                        w = w[:-3]
                    elif len(w) - 3 >= r1:
                        w = w[:-3] + "eux"
                elif w.endswith("abl") and len(w) - 3 >= r2:
                    w = w[:-3]
                elif w.endswith("iqU") and len(w) - 3 >= r2:
                    w = w[:-3]
                elif w.endswith("ièr") and len(w) - 3 >= rv:
                    w = w[:-3] + "i"
                elif w.endswith("Ièr") and len(w) - 3 >= rv:
                    w = w[:-3] + "i"
        elif s in ("ités", "ité"):
            if in_r2(len(s)):
                w = w[: -len(s)]
                if w.endswith("abil"):
                    if len(w) - 4 >= r2:
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("ives", "ifs", "ive", "if"):
            if in_r2(len(s)):
                w = w[: -len(s)]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        if len(w) - 2 >= r2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif s == "eaux":
            w = w[:-4] + "eau"
        elif s == "aux":
            if in_r1(len(s)):
                w = w[:-3] + "al"
        elif s in ("euses", "euse"):
            if in_r2(len(s)):
                w = w[: -len(s)]
            elif in_r1(len(s)):
                w = w[: -len(s)] + "eux"
        elif s in ("issements", "issement"):
            if in_r1(len(s)) and len(w) - len(s) - 1 >= 0 and w[
                len(w) - len(s) - 1
            ] not in _FR_VOWELS:
                w = w[: -len(s)]
        elif s == "amment":
            if in_rv(len(s)):
                w = w[: -len(s)] + "ant"
                do_2a = True
        elif s == "emment":
            if in_rv(len(s)):
                w = w[: -len(s)] + "ent"
                do_2a = True
        elif s in ("ments", "ment"):
            k = len(w) - len(s) - 1
            if k >= 0 and w[k] in _FR_VOWELS and k >= rv:
                w = w[: -len(s)]
                do_2a = True
    changed = w != pre

    # ---- step 2a/2b (verb suffixes) when step 1 left the word intact
    # or ended on the ment/amment/emment path
    if not changed or do_2a:
        pre2 = w
        s = _longest(w, _FR_2A)
        hit_2a = False
        if s:
            k = len(w) - len(s) - 1
            if len(w) - len(s) >= rv and k >= 0 and w[k] not in _FR_VOWELS and k >= rv:
                w = w[: -len(s)]
                hit_2a = True
        if not hit_2a:
            s = _longest(w, _FR_2B_ER + _FR_2B_A + ("ions",))
            if s == "ions":
                if in_r2(len(s)):
                    w = w[: -len(s)]
            elif s in _FR_2B_ER:
                if in_rv(len(s)):
                    w = w[: -len(s)]
            elif s in _FR_2B_A:
                if in_rv(len(s)):
                    w = w[: -len(s)]
                    if w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]
        changed = changed or (w != pre2)

    if changed:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4
        if (
            w.endswith("s")
            and len(w) >= 2
            and w[-2] not in "aiouès"
            and not w.endswith("His")
        ):
            w = w[:-1]
        s = _longest(w, ("Ière", "ière", "Ier", "ier", "ion", "e", "ë"))
        if s == "ion":
            if in_r2(3) and len(w) >= 4 and w[-4] in "st":
                w = w[:-3]
        elif s in ("Ière", "ière", "Ier", "ier"):
            w = w[: -len(s)] + "i"
        elif s == "e":
            if in_rv(1):
                w = w[:-1]
        elif s == "ë":
            if w.endswith("guë") and len(w) - 1 >= rv:
                w = w[:-1]

    # step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break

    # step 6: un-accent é/è before a final run of non-vowels
    i = len(w) - 1
    seen_cons = 0
    while i >= 0 and w[i] not in _FR_VOWELS:
        seen_cons += 1
        i -= 1
    if seen_cons >= 1 and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1 :]

    return w.replace("U", "u").replace("I", "i").replace("Y", "i")


# ===========================================================================
# Italian (`ext/ItalianStemmer.java` semantics)

_IT_VOWELS = "aeiouàèìòù"

_IT_PRON = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene",
    "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
    "telo", "tene", "cela", "cele", "celi", "celo", "cene",
    "vela", "vele", "veli", "velo", "vene",
    "gli", "ci", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
)
_IT_STEP1_R2_DEL = (
    "atrice", "atrici", "abile", "abili", "ibile", "ibili", "mente",
    "anza", "anze", "iche", "ichi", "ismo", "ismi", "ista", "iste",
    "isti", "istà", "istè", "istì", "ante", "anti", "ico", "ici",
    "ica", "ice", "oso", "osi", "osa", "ose",
)
_IT_STEP2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo",
    "enda", "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo",
    "immo", "irai", "irei", "isca", "isce", "isci", "isco", "ano",
    "are", "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà",
    "ere", "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò",
    "ita", "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta",
    "ute", "uti", "uto", "ar", "ir",
)


@lru_cache(maxsize=200_000)
def italian_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    # replace acute accents with grave, mark u/i between vowels
    w = (
        word.replace("á", "à").replace("é", "è").replace("í", "ì")
        .replace("ó", "ò").replace("ú", "ù")
    )
    ch = list(w)
    for i in range(1, len(ch) - 1):
        if ch[i] in "ui" and ch[i - 1] in _IT_VOWELS and ch[i + 1] in _IT_VOWELS:
            ch[i] = ch[i].upper()
        elif ch[i] == "u" and ch[i - 1] == "q":
            ch[i] = "U"
    w = "".join(ch)
    rv = _rv_romance(w, _IT_VOWELS)
    r1 = _r1_start(w, _IT_VOWELS)
    r2 = _r2_start(w, _IT_VOWELS, r1)

    def in_rv(k: int) -> bool:
        return len(w) - k >= rv

    def in_r1(k: int) -> bool:
        return len(w) - k >= r1

    def in_r2(k: int) -> bool:
        return len(w) - k >= r2

    # step 0: attached pronoun
    p = _longest(w, _IT_PRON)
    if p:
        base = w[: -len(p)]
        if len(w) - len(p) - 4 >= 0 and base.endswith(("ando", "endo")) and len(
            base
        ) - 4 >= rv:
            w = base
        else:
            t = _longest(base, ("ar", "er", "ir"))
            if t and len(base) - len(t) >= rv:
                w = base + "e"

    before = w
    # step 1
    s = _longest(
        w,
        _IT_STEP1_R2_DEL + (
            "azione", "azioni", "atore", "atori", "logia", "logie",
            "uzione", "uzioni", "usione", "usioni", "enza", "enze",
            "amento", "amenti", "imento", "imenti", "amente",
            "ità", "ivo", "ivi", "iva", "ive",
        ),
    )
    if s:
        if s in _IT_STEP1_R2_DEL:
            if in_r2(len(s)):
                w = w[: -len(s)]
        elif s in ("azione", "azioni", "atore", "atori"):
            if in_r2(len(s)):
                w = w[: -len(s)]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("logia", "logie"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "log"
        elif s in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "u"
        elif s in ("enza", "enze"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "ente"
        elif s in ("amento", "amenti", "imento", "imenti"):
            if in_rv(len(s)):
                w = w[: -len(s)]
        elif s == "amente":
            if in_r1(len(s)):
                w = w[: -len(s)]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    t = _longest(w, ("os", "ic", "abil"))
                    if t and len(w) - len(t) >= r2:
                        w = w[: -len(t)]
        elif s == "ità":
            if in_r2(len(s)):
                w = w[: -len(s)]
                t = _longest(w, ("abil", "ic", "iv"))
                if t and len(w) - len(t) >= r2:
                    w = w[: -len(t)]
        elif s in ("ivo", "ivi", "iva", "ive"):
            if in_r2(len(s)):
                w = w[: -len(s)]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]

    # step 2 (if step 1 removed nothing)
    if w == before:
        s = _longest(w, _IT_STEP2)
        if s and in_rv(len(s)):
            w = w[: -len(s)]

    # step 3a: final vowel (and a preceding i) in RV
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 1 >= rv:
        w = w[:-1]

    return w.replace("U", "u").replace("I", "i")


# ===========================================================================
# Portuguese (`ext/PortugueseStemmer.java` semantics)

_PT_VOWELS = "aeiouáéíóúâêô"

_PT_STEP1_R2_DEL = (
    "amentos", "imentos", "amento", "imento", "adoras", "adores",
    "aço~es", "ismos", "istas", "ezas", "icos", "icas", "ismo",
    "ável", "ível", "ista", "osos", "osas", "adora", "aça~o",
    "ância", "eza", "ico", "ica", "oso", "osa", "ador",
    "ante", "antes",
)
_PT_STEP2 = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "éreis", "íreis", "áveis", "íamos", "armos",
    "ermos", "irmos", "aria", "eria", "iria", "asse", "esse", "isse",
    "aste", "este", "iste", "arei", "erei", "irei", "aram", "eram",
    "iram", "avam", "arem", "erem", "irem", "ando", "endo", "indo",
    "adas", "idas", "arás", "aras", "erás", "eras", "irás", "avas",
    "ares", "eres", "ires", "íeis", "ados", "idos", "ámos", "amos",
    "emos", "imos", "iras", "ada", "ida", "ará", "ara", "erá", "era",
    "irá", "ava", "iam", "ado", "ido", "ias", "ais", "eis", "ira",
    "ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is", "eu",
    "iu", "ou",
)


@lru_cache(maxsize=200_000)
def portuguese_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_romance(w, _PT_VOWELS)
    r1 = _r1_start(w, _PT_VOWELS)
    r2 = _r2_start(w, _PT_VOWELS, r1)

    def in_rv(k: int) -> bool:
        return len(w) - k >= rv

    def in_r1(k: int) -> bool:
        return len(w) - k >= r1

    def in_r2(k: int) -> bool:
        return len(w) - k >= r2

    before = w
    # step 1: standard suffixes
    s = _longest(
        w,
        _PT_STEP1_R2_DEL + (
            "logias", "logia", "uço~es", "uça~o", "ências", "ência",
            "amente", "mente", "idades", "idade",
            "ivas", "ivos", "iva", "ivo", "iras", "ira",
        ),
    )
    if s:
        if s in _PT_STEP1_R2_DEL:
            if in_r2(len(s)):
                w = w[: -len(s)]
                if w.endswith("ic") and len(w) - 2 >= r2 and s in (
                    "adoras", "adores", "adora", "ador", "aça~o", "aço~es",
                    "antes", "ante", "ância",
                ):
                    w = w[:-2]
        elif s in ("logias", "logia"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "log"
        elif s in ("uço~es", "uça~o"):
            if in_r2(len(s)):
                w = w[: -len(s)] + "u"
        elif s in ("ências", "ência"):
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
                t = _longest(w, ("ante", "avel", "ível"))
                if t and len(w) - len(t) >= r2:
                    w = w[: -len(t)]
        elif s in ("idades", "idade"):
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
        elif s in ("iras", "ira"):
            if in_rv(len(s)) and w[: -len(s)].endswith("e"):
                w = w[: -len(s)] + "ir"

    step1_changed = w != before
    # step 2: verb suffixes (only if step 1 removed nothing)
    if not step1_changed:
        s = _longest(w, _PT_STEP2)
        if s and in_rv(len(s)):
            w = w[: -len(s)]

    # step 3: i preceded by c, when 1 or 2 altered the word
    if w != before:
        if w.endswith("i") and len(w) - 1 >= rv and w[:-1].endswith("c"):
            w = w[:-1]
    else:
        # step 4: residual suffix
        s = _longest(w, ("os", "a", "i", "o", "á", "í", "ó"))
        if s and in_rv(len(s)):
            w = w[: -len(s)]

    # step 5: final e/é/ê + guard for gu/ci
    if w and w[-1] in "eéê" and len(w) - 1 >= rv:
        w = w[:-1]
        if (w.endswith("gu") and len(w) - 1 >= rv) or (
            w.endswith("ci") and len(w) - 1 >= rv
        ):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ===========================================================================
# Scandinavian trio: Swedish / Norwegian / Danish
# (`org/tartarus/snowball/ext/SwedishStemmer.java`,
# `NorwegianStemmer.java`, `DanishStemmer.java`, wired by
# `analysis/common/.../sv/SwedishAnalyzer.java:43` etc.)
#
# All three share the Scandinavian R1 adjustment: R1 must leave at
# least 3 letters before it (snowballstem.org "Scandinavian stemmers").
# Suffix searches are longest-match restricted to R1.


def _scand_r1(word: str, vowels: str) -> int:
    return max(_r1_start(word, vowels), 3)


_SV_VOWELS = "aeiouyäåö"
_SV_S_END = "bcdfghjklmnoprtvy"
_SV_STEP1 = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
    "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het", "ast",
)
_SV_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


@lru_cache(maxsize=200_000)
def swedish_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _SV_VOWELS)
    # step 1: longest suffix in R1; `s` only after a valid s-ending
    cands = [s for s in _SV_STEP1 if w.endswith(s) and len(w) - len(s) >= r1]
    if w.endswith("s") and len(w) - 1 >= r1:
        cands.append("s")
    if cands:
        s = max(cands, key=len)
        if s == "s":
            if len(w) >= 2 and w[-2] in _SV_S_END:
                w = w[:-1]
        else:
            w = w[: -len(s)]
    # step 2: consonant-pair endings lose their last letter
    if len(w) - 2 >= r1 and w[-2:] in _SV_STEP2:
        w = w[:-1]
    # step 3 (candidates limited to R1: the reference's `setlimit
    # tomark p1` makes a too-long suffix non-matching, not blocking)
    cands = [
        s
        for s in ("lig", "ig", "els", "löst", "fullt")
        if w.endswith(s) and len(w) - len(s) >= r1
    ]
    if cands:
        s = max(cands, key=len)
        if s in ("löst", "fullt"):
            w = w[:-1]
        else:
            w = w[: -len(s)]
    return w


_NO_VOWELS = "aeiouyæåø"
_NO_S_END = "bcdfghjlmnoprtvyz"
_NO_STEP1 = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
)
_NO_STEP3 = (
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
)


@lru_cache(maxsize=200_000)
def norwegian_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _NO_VOWELS)
    # step 1: longest in R1 among delete-suffixes, `s` (valid s-ending:
    # bcdfghjlmnoprtvyz, or `k` not preceded by a vowel), and erte/ert -> er
    cands = [s for s in _NO_STEP1 if w.endswith(s) and len(w) - len(s) >= r1]
    if w.endswith("s") and len(w) - 1 >= r1:
        cands.append("s")
    for s in ("erte", "ert"):
        if w.endswith(s) and len(w) - len(s) >= r1:
            cands.append(s)
    if cands:
        s = max(cands, key=len)
        if s == "s":
            prev = w[-2] if len(w) >= 2 else ""
            ok = prev in _NO_S_END or (
                prev == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS)
            )
            if ok:
                w = w[:-1]
        elif s in ("erte", "ert"):
            w = w[: -len(s)] + "er"
        else:
            w = w[: -len(s)]
    # step 2: dt / vt lose the t
    if len(w) - 2 >= r1 and w[-2:] in ("dt", "vt"):
        w = w[:-1]
    # step 3 (R1-limited candidate matching, as in step 1)
    cands = [s for s in _NO_STEP3 if w.endswith(s) and len(w) - len(s) >= r1]
    if cands:
        w = w[: -len(max(cands, key=len))]
    return w


_DA_VOWELS = "aeiouyæåø"
_DA_S_END = "abcdfghjklmnoprtvyzå"
_DA_STEP1 = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer", "heds",
    "es", "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens",
    "erens", "ers", "ets", "erets", "et", "eret",
)
_DA_STEP2 = ("gd", "dt", "gt", "kt")


@lru_cache(maxsize=200_000)
def danish_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _DA_VOWELS)
    # step 1
    cands = [s for s in _DA_STEP1 if w.endswith(s) and len(w) - len(s) >= r1]
    if w.endswith("s") and len(w) - 1 >= r1:
        cands.append("s")
    if cands:
        s = max(cands, key=len)
        if s == "s":
            if len(w) >= 2 and w[-2] in _DA_S_END:
                w = w[:-1]
        else:
            w = w[: -len(s)]

    def _step2(v: str) -> str:
        if len(v) - 2 >= r1 and v[-2:] in _DA_STEP2:
            return v[:-1]
        return v

    w = _step2(w)
    # step 3: unconditional igst -> ig, then R1 suffixes
    if w.endswith("igst"):
        w = w[:-2]
    cands = [
        s
        for s in ("ig", "lig", "elig", "els", "løst")
        if w.endswith(s) and len(w) - len(s) >= r1
    ]
    if cands:
        s = max(cands, key=len)
        if s == "løst":
            w = w[:-1]
        else:
            w = w[: -len(s)]
            w = _step2(w)
    # step 4 (undouble): final double consonant in R1 drops one letter
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _DA_VOWELS
        and len(w) - 1 >= r1
    ):
        w = w[:-1]
    return w


# ===========================================================================
# Dutch (`org/tartarus/snowball/ext/DutchStemmer.java` via
# `analysis/common/.../nl/DutchAnalyzer.java`). Prelude de-accents
# umlaut/acute vowels and marks consonantal y/i (initial y, y after a
# vowel, i between vowels) upper-case; R1 (min-3) and R2 are fixed
# offsets computed on the marked word, as in the reference.

_NL_VOWELS = "aeiouyè"
_NL_DEACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_undouble(w: str) -> str:
    return w[:-1] if w[-2:] in ("kk", "dd", "tt") else w


def _nl_en_ok(stem: str) -> bool:
    """Valid en-ending: a non-vowel, and not the string gem."""
    return (
        bool(stem)
        and stem[-1] not in _NL_VOWELS
        and not stem.endswith("gem")
    )


@lru_cache(maxsize=200_000)
def dutch_stem(word: str) -> str:
    w = word.translate(_NL_DEACCENT)
    chars = list(w)
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or w[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif (
            c == "i"
            and 0 < i < len(w) - 1
            and w[i - 1] in _NL_VOWELS
            and w[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    w = "".join(chars)
    r1 = max(_r1_start(w, _NL_VOWELS), 3)
    r2 = _r2_start(w, _NL_VOWELS, _r1_start(w, _NL_VOWELS))

    def in_r1(n: int) -> bool:
        return len(w) - n >= r1

    def in_r2(n: int) -> bool:
        return len(w) - n >= r2

    # step 1: longest among heden / ene,en / se,s (condition per class)
    s = _longest(w, ("heden", "ene", "en", "se", "s"))
    if s == "heden":
        if in_r1(5):
            w = w[:-5] + "heid"
    elif s in ("ene", "en"):
        if in_r1(len(s)) and _nl_en_ok(w[: -len(s)]):
            w = _nl_undouble(w[: -len(s)])
    elif s in ("se", "s"):
        stem = w[: -len(s)]
        if in_r1(len(s)) and stem and stem[-1] not in _NL_VOWELS + "j":
            w = stem
    # step 2: final e after a non-vowel
    e_found = False
    if (
        w.endswith("e")
        and in_r1(1)
        and len(w) >= 2
        and w[-2] not in _NL_VOWELS
    ):
        e_found = True
        w = _nl_undouble(w[:-1])
    # step 3a: heid
    if w.endswith("heid") and in_r2(4) and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en") and in_r1(2) and _nl_en_ok(w[:-2]):
            w = _nl_undouble(w[:-2])
    # step 3b: d-suffixes
    s = _longest(w, ("end", "ing", "ig", "lijk", "baar", "bar"))
    if s in ("end", "ing"):
        if in_r2(3):
            w = w[:-3]
            if (
                w.endswith("ig")
                and len(w) - 2 >= r2
                and (len(w) < 3 or w[-3] != "e")
            ):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
    elif s == "ig":
        if in_r2(2) and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif s == "lijk":
        if in_r2(4):
            w = w[:-4]
            if (
                w.endswith("e")
                and len(w) - 1 >= r1
                and len(w) >= 2
                and w[-2] not in _NL_VOWELS
            ):
                w = _nl_undouble(w[:-1])
    elif s == "baar":
        if in_r2(4):
            w = w[:-4]
    elif s == "bar":
        if in_r2(3) and e_found:
            w = w[:-3]
    # step 4: undouble vowel in C V V D (D != I)
    if (
        len(w) >= 4
        and w[-1] not in _NL_VOWELS
        and w[-1] != "I"
        and w[-2] == w[-3]
        and w[-2] in "aeou"
        and w[-4] not in _NL_VOWELS
    ):
        w = w[:-2] + w[-1]
    return w.lower()


# ===========================================================================
# dispatch

SNOWBALL_LANGS = ("de", "fr", "es", "it", "pt", "ru", "nl", "sv", "no", "da")

_DISPATCH = {
    "de": german_stem,
    "fr": french_stem,
    "es": spanish_stem,
    "it": italian_stem,
    "pt": portuguese_stem,
    "ru": russian_stem,
    "nl": dutch_stem,
    "sv": swedish_stem,
    "no": norwegian_stem,
    "da": danish_stem,
}


def snowball_stem(lang: str, word: str) -> str:
    fn = _DISPATCH.get(lang)
    if fn is None:
        raise ValueError(f"unsupported snowball language: {lang!r}")
    return fn(word.lower())


# ===========================================================================
# per-language analysis chains (FrenchAnalyzer.java:43 and siblings:
# StandardTokenizer → LowerCase → Stop → SnowballStem). The stop sets
# are trimmed common-function-word lists (the reference ships the full
# snowball stopword files; a trimmed set changes recall only for
# function words, which the stemmer would not conflate anyway).

SNOWBALL_STOP = {
    "fr": frozenset(
        """le la les de des du un une et en à au aux que qui dans pour
        par sur pas ne se ce cette il elle ils elles nous vous est sont
        était avec son sa ses plus ou où""".split()
    ),
    "de": frozenset(
        """der die das den dem des ein eine einer eines und oder aber
        nicht mit von zu im in am an auf für ist sind war waren es sie
        er wir ihr auch als bei nach""".split()
    ),
    "es": frozenset(
        """el la los las un una unos unas de del y o en a que por para
        con no se es son fue su sus más como pero este esta lo al""".split()
    ),
    "it": frozenset(
        """il lo la i gli le un una di del e o in a che per con non si
        è sono da su come ma questo questa dei delle""".split()
    ),
    "pt": frozenset(
        """o a os as um uma de do da dos das e ou em no na nos nas que
        por para com não se é são foi seu sua mais como mas este
        esta""".split()
    ),
    "ru": frozenset(
        """и в во не на я с со как а то все она так его но да ты к у
        же вы за бы по ее мне было вот от это он мы они""".split()
    ),
    "nl": frozenset(
        """de het een en van in op dat die is was zijn voor met als
        maar om aan er ook niet naar bij uit dan of nog wordt deze""".split()
    ),
    "sv": frozenset(
        """och det att i en jag hon som han på den med var sig för så
        till är men ett om hade de av icke vi eller vad""".split()
    ),
    "no": frozenset(
        """og i jeg det at en et den til er som på de med han av ikke
        der så var meg seg men ett har om vi mot""".split()
    ),
    "da": frozenset(
        """og i jeg det at en den til er som på de med han af for ikke
        der så var mig sig men et har om vi""".split()
    ),
}


def snowball_analyze(lang: str):
    """Callable analyzer for ``InvertedIndex.build(analyzer=...)``:
    UAX#29 tokenize → lowercase → stop (trimmed set) → snowball stem.
    Positions are pre-stop ordinals (StopFilter keeps increments), dl
    is the post-stop token count — same contract as english_analyze."""
    from lucene_spark.analysis.uax29 import uax29_tokenize

    stop = SNOWBALL_STOP[lang]
    stem = _DISPATCH[lang]

    def _an(text: str) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for pos, tok in enumerate(uax29_tokenize(text)):
            tok = tok.lower()
            if tok and tok not in stop:
                out.append((stem(tok), pos))
        return out

    _an.__name__ = f"snowball_{lang}_analyze"
    return _an


def snowball_stem_udf(lang: str):
    """Arrow-batched stem column: string → string (memoized per unique
    token by the per-language lru_cache)."""
    from pyspark.sql.functions import pandas_udf

    fn = _DISPATCH[lang]

    @pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(lambda t: fn(t.lower()) if isinstance(t, str) else t)

    return _stem
