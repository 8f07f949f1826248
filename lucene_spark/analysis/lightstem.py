"""Light stemmers + normalizers for Arabic, Hindi, Indonesian.

Re-expresses the reference's non-Snowball rule stemmers for three of
the largest web languages:

- Arabic (`lucene/analysis/common/src/java/org/apache/lucene/analysis/ar/ArabicNormalizer.java`,
  `ArabicStemmer.java`): the Larkey/Ballesteros-Croft "light10"
  algorithm — orthographic normalization (hamza'd alefs → bare alef,
  dotless yeh → yeh, teh marbuta → heh, tatweel + harakat deleted),
  then ONE definite-article/conjunction prefix and then every matching
  suffix from the list, each guarded by the reference's length checks
  (`ArabicStemmer.java` ``startsWithCheckLength``: the single-char
  ``waw`` prefix needs len ≥ 4, others len ≥ prefix+2;
  ``endsWithCheckLength``: every suffix leaves ≥ 2 chars).
- Hindi (`hi/HindiNormalizer.java`, `hi/HindiStemmer.java`): the
  Ramanathan & Rao lightweight stemmer — Devanagari normalization
  (nukta forms folded, candrabindu → bindu, dead-n → bindu, virama /
  ZWJ / ZWNJ deleted, chandra and long vowels shortened) followed by
  the longest of the published 1–5-codepoint suffixes, tier ``k``
  requiring word length > k+1.
- Indonesian (`id/IndonesianStemmer.java`): the Tala (2003) stemmer —
  inflectional particle (kah/lah/pun) and possessive (ku/mu/nya)
  removal, then derivational first-order prefix (meng-/meny-/men-/
  mem-/me-/peng-/peny-/pen-/pem-/di-/ter-/ke- with the s/t
  recodings), suffix (-kan/-an/-i gated by the removed-prefix flags),
  and second-order prefix (ber-/be-/per-/pe- + the bel-/pel-ajar
  specials), all guarded by the > 2-syllable counts.

Scale shape: per-token pure functions, memoized per unique token,
applied inside the existing Arrow-batched analysis UDFs — zero extra
Spark stages, no shuffle (same contract as `analysis/snowball.py`).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

__all__ = [
    "arabic_normalize",
    "arabic_stem",
    "hindi_normalize",
    "hindi_stem",
    "indonesian_stem",
    "light_stem",
    "light_stem_udf",
    "LIGHT_LANGS",
    "LIGHT_STOP",
]

# ---------------------------------------------------------------------------
# Arabic

_AR_FOLD = str.maketrans(
    {
        "آ": "ا",  # alef madda -> alef
        "أ": "ا",  # alef hamza above -> alef
        "إ": "ا",  # alef hamza below -> alef
        "ى": "ي",  # dotless yeh -> yeh
        "ة": "ه",  # teh marbuta -> heh
        "ـ": None,  # tatweel
        "ً": None,  # fathatan
        "ٌ": None,  # dammatan
        "ٍ": None,  # kasratan
        "َ": None,  # fatha
        "ُ": None,  # damma
        "ِ": None,  # kasra
        "ّ": None,  # shadda
        "ْ": None,  # sukun
    }
)

# NOTE: the stemmer runs BEFORE normalization in our chain order? No —
# the reference analyzer applies ArabicNormalizationFilter first, then
# ArabicStemFilter; `arabic_stem` composes them the same way. The
# stemmer's own tables are written against normalized text, so teh
# marbuta (ة) appears here as heh (ه) post-fold.
_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_normalize(word: str) -> str:
    return word.translate(_AR_FOLD)


@lru_cache(maxsize=200_000)
def arabic_stem(word: str) -> str:
    w = arabic_normalize(word)
    # one prefix, first match (ArabicStemmer.stemPrefix)
    for p in _AR_PREFIXES:
        if w.startswith(p):
            if len(p) == 1 and len(w) < 4:
                continue
            if len(p) > 1 and len(w) < len(p) + 2:
                continue
            w = w[len(p):]
            break
    # every matching suffix, in table order (ArabicStemmer.stemSuffix)
    for s in _AR_SUFFIXES:
        if w.endswith(s) and len(w) >= len(s) + 2:
            w = w[: -len(s)]
    return w


# ---------------------------------------------------------------------------
# Hindi

_HI_FOLD = str.maketrans(
    {
        "ँ": "ं",  # candrabindu -> bindu
        "़": None,  # nukta
        "ऩ": "न",
        "ऱ": "र",
        "ऴ": "ळ",
        "क़": "क",
        "ख़": "ख",
        "ग़": "ग",
        "ज़": "ज",
        "ड़": "ड",
        "ढ़": "ढ",
        "फ़": "फ",
        "य़": "य",
        "‌": None,  # zwnj
        "‍": None,  # zwj
        "्": None,  # virama
        "ॅ": "े",  # chandra e
        "ॆ": "े",  # short e
        "ॉ": "ो",  # chandra o
        "ॊ": "ो",  # short o
        "ऍ": "ए",
        "ऎ": "ए",
        "ऑ": "ओ",
        "ऒ": "ओ",
        "ॲ": "अ",
        "आ": "अ",  # aa -> a
        "ई": "इ",  # ii -> i
        "ऊ": "उ",  # uu -> u
        "ॠ": "ऋ",
        "ॡ": "ऌ",
        "ऐ": "ए",  # ai -> e
        "औ": "ओ",  # au -> o
        "ी": "ि",  # dep. ii -> i
        "ू": "ु",  # dep. uu -> u
        "ॄ": "ृ",
        "ॣ": "ॢ",
        "ै": "े",  # dep. ai -> e
        "ौ": "ो",  # dep. au -> o
    }
)


def hindi_normalize(word: str) -> str:
    # the one context-dependent rule first: dead n (न + virama) -> bindu
    w = word.replace("न्", "ं")
    return w.translate(_HI_FOLD)


_HI_SUF_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_SUF_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
             "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
             "ियों", "ियां")
_HI_SUF_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
             "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
             "ुआं")
_HI_SUF_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
             "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_SUF_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


@lru_cache(maxsize=200_000)
def hindi_stem(word: str) -> str:
    w = hindi_normalize(word)
    for n, tier in ((5, _HI_SUF_5), (4, _HI_SUF_4), (3, _HI_SUF_3),
                    (2, _HI_SUF_2), (1, _HI_SUF_1)):
        if len(w) > n + 1 and w.endswith(tier):
            return w[:-n]
    return w


# ---------------------------------------------------------------------------
# Indonesian

_ID_VOWELS = set("aeiou")

_REMOVED_KE = 1
_REMOVED_PENG = 2
_REMOVED_DI = 4
_REMOVED_MENG = 8
_REMOVED_TER = 16
_REMOVED_BER = 32
_REMOVED_PE = 64


def _id_first_order(w: str, syll: int, flags: int):
    if w.startswith("meng"):
        return w[4:], syll - 1, flags | _REMOVED_MENG
    if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
        return "s" + w[4:], syll - 1, flags | _REMOVED_MENG
    if w.startswith("men"):
        return w[3:], syll - 1, flags | _REMOVED_MENG
    if w.startswith("mem"):
        return w[3:], syll - 1, flags | _REMOVED_MENG
    if w.startswith("me"):
        return w[2:], syll - 1, flags | _REMOVED_MENG
    if w.startswith("peng"):
        return w[4:], syll - 1, flags | _REMOVED_PENG
    if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
        return "s" + w[4:], syll - 1, flags | _REMOVED_PENG
    if w.startswith("peny"):
        return w[4:], syll - 1, flags | _REMOVED_PENG
    if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
        return "t" + w[3:], syll - 1, flags | _REMOVED_PENG
    if w.startswith("pen"):
        return w[3:], syll - 1, flags | _REMOVED_PENG
    if w.startswith("pem"):
        return w[3:], syll - 1, flags | _REMOVED_PENG
    if w.startswith("di"):
        return w[2:], syll - 1, flags | _REMOVED_DI
    if w.startswith("ter"):
        return w[3:], syll - 1, flags | _REMOVED_TER
    if w.startswith("ke"):
        return w[2:], syll - 1, flags | _REMOVED_KE
    return w, syll, flags


def _id_second_order(w: str, syll: int, flags: int):
    if w.startswith("ber"):
        return w[3:], syll - 1, flags | _REMOVED_BER
    if w == "belajar":
        return w[3:], syll - 1, flags | _REMOVED_BER
    if (w.startswith("be") and len(w) > 4 and w[2] not in _ID_VOWELS
            and w[3] == "e" and w[4] == "r"):
        return w[2:], syll - 1, flags | _REMOVED_BER
    if w.startswith("per"):
        return w[3:], syll - 1, flags
    if w == "pelajar":
        return w[3:], syll - 1, flags
    if w.startswith("pe"):
        return w[2:], syll - 1, flags | _REMOVED_PE
    return w, syll, flags


def _id_suffix(w: str, syll: int, flags: int):
    if (w.endswith("kan")
            and not flags & (_REMOVED_KE | _REMOVED_PENG | _REMOVED_PE)):
        return w[:-3], syll - 1, flags
    if (w.endswith("an")
            and not flags & (_REMOVED_DI | _REMOVED_MENG | _REMOVED_TER)):
        return w[:-2], syll - 1, flags
    if (w.endswith("i") and not w.endswith("si")
            and not flags & (_REMOVED_BER | _REMOVED_KE | _REMOVED_PENG)):
        return w[:-1], syll - 1, flags
    return w, syll, flags


@lru_cache(maxsize=200_000)
def indonesian_stem(word: str, derivational: bool = True) -> str:
    w = word
    syll = sum(1 for ch in w if ch in _ID_VOWELS)
    flags = 0
    if syll > 2 and w.endswith(("kah", "lah", "pun")):
        syll -= 1
        w = w[:-3]
    if syll > 2:
        if w.endswith(("ku", "mu")):
            syll -= 1
            w = w[:-2]
        elif w.endswith("nya"):
            syll -= 1
            w = w[:-3]
    if derivational:
        old = len(w)
        if syll > 2:
            w, syll, flags = _id_first_order(w, syll, flags)
        if len(w) != old:  # a first-order rule fired
            old = len(w)
            if syll > 2:
                w, syll, flags = _id_suffix(w, syll, flags)
            if len(w) != old:  # a suffix rule fired
                if syll > 2:
                    w, syll, flags = _id_second_order(w, syll, flags)
        else:
            if syll > 2:
                w, syll, flags = _id_second_order(w, syll, flags)
            if syll > 2:
                w, syll, flags = _id_suffix(w, syll, flags)
    return w


# ---------------------------------------------------------------------------
# dispatch

LIGHT_LANGS = ("ar", "hi", "id")

_DISPATCH = {
    "ar": arabic_stem,
    "hi": hindi_stem,
    "id": indonesian_stem,
}

LIGHT_STOP = {
    # compact high-frequency subsets of the reference's per-language
    # stopword files (`analysis/common/.../ar/stopwords.txt` etc.)
    "ar": frozenset(
        """من في على ان الى عن هذا هذه ذلك التي الذي مع كان كانت لم لن
        ما لا او و هو هي انه بها به قد كل بعد غير بين""".split()
    ),
    "hi": frozenset(
        """के का एक में की है यह और से हैं को पर इस होता कि जो कर मे गया
        करने किया लिये अपने ने बनी नहीं तो ही या हो था द्वारा""".split()
    ),
    "id": frozenset(
        """yang dan di ke dari ini itu dengan untuk pada adalah sebagai
        dalam tidak akan oleh juga saya kami kita mereka ada atau bisa
        karena telah sudah saat harus""".split()
    ),
}


def light_stem(lang: str, word: str) -> str:
    try:
        fn = _DISPATCH[lang]
    except KeyError:
        raise ValueError(f"no light stemmer for language {lang!r}")
    return fn(word)


def light_stem_udf(lang: str):
    """Arrow-batched stem column: string → string (memoized per unique
    token by the per-language lru_cache)."""
    from pyspark.sql.functions import pandas_udf

    fn = _DISPATCH[lang]

    @pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(lambda t: fn(t) if isinstance(t, str) else t)

    return _stem
