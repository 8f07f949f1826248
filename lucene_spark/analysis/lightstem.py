"""Light stemmers + normalizers for Arabic, Hindi, Indonesian, Czech,
Bulgarian, Finnish, Latvian, Persian (and Greek via `analysis/greek.py`).

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
    "bengali_normalize",
    "bengali_stem",
    "bulgarian_stem",
    "sorani_normalize",
    "sorani_stem",
    "czech_stem",
    "finnish_stem",
    "hindi_normalize",
    "hindi_stem",
    "indonesian_stem",
    "latvian_stem",
    "persian_normalize",
    "light_analyze",
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
# Czech (`cz/CzechStemmer.java`: the Dolamic & Savoy light stemmer —
# case-suffix tiers, possessive -ov/-in/-ův, then the palatalization
# normalizations čt→ck, št→sk, c/č→k, z/ž→h, e-deletion, ů→o).

_CZ_CASE_5 = ("atech",)
_CZ_CASE_4 = ("ětem", "etem", "atům")
_CZ_CASE_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
              "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
              "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_CASE_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
              "mi", "ou")
_CZ_CASE_1 = "aeiouůyáéíýě"


def _cz_remove_case(w: str) -> str:
    n = len(w)
    if n > 7 and w.endswith(_CZ_CASE_5):
        return w[:-5]
    if n > 6 and w.endswith(_CZ_CASE_4):
        return w[:-4]
    if n > 5 and w.endswith(_CZ_CASE_3):
        return w[:-3]
    if n > 4 and w.endswith(_CZ_CASE_2):
        return w[:-2]
    if n > 3 and w[-1] in _CZ_CASE_1:
        return w[:-1]
    return w


@lru_cache(maxsize=200_000)
def czech_stem(word: str) -> str:
    w = _cz_remove_case(word)
    if len(w) > 5 and (w.endswith("ov") or w.endswith("in")
                       or w.endswith("ův")):
        w = w[:-2]
    if not w:
        return w
    # normalize (first matching rule only, CzechStemmer.normalize)
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


# ---------------------------------------------------------------------------
# Bulgarian (`bg/BulgarianStemmer.java`: Savoy's BUIR light stemmer —
# definite article, plural with the к/г/х and я rewrites, final-vowel
# drops, ен→н, ъ-elision; len<4 words untouched).


def _bg_article(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("ият"):
        return w[:-3]
    if n > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        return w[:-2]
    if n > 4 and w.endswith("ят"):
        return w[:-2]
    return w


def _bg_plural(w: str) -> str:
    n = len(w)
    if n > 6:
        if w.endswith("овци"):
            return w[:-3]
        if w.endswith("ове"):
            return w[:-3]
        if w.endswith("еве"):
            return w[:-3] + "й"
    if n > 5:
        if w.endswith("ища"):
            return w[:-3]
        if w.endswith("та"):
            return w[:-2]
        if w.endswith("ци"):
            return w[:-2] + "к"
        if w.endswith("зи"):
            return w[:-2] + "г"
        if w[-3] == "е" and w[-1] == "и":
            return w[:-3] + "я" + w[-2]
    if n > 4:
        if w.endswith("си"):
            return w[:-2] + "х"
        if w.endswith("и"):
            return w[:-1]
    return w


@lru_cache(maxsize=200_000)
def bulgarian_stem(word: str) -> str:
    if len(word) < 4:
        return word
    if len(word) > 5 and word.endswith("ища"):
        return word[:-3]
    w = _bg_plural(_bg_article(word))
    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w.endswith(("а", "о", "е")):
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


# ---------------------------------------------------------------------------
# Persian (`fa/PersianNormalizer.java`: farsi yeh / yeh barree → arabic
# yeh, keheh → kaf, heh-yeh / heh-goal → heh, hamza-above deleted; the
# reference PersianAnalyzer has NO stemmer, so 'fa' dispatch is the
# normalizer alone).

_FA_FOLD = str.maketrans(
    {
        "ی": "ي",  # farsi yeh -> yeh
        "ے": "ي",  # yeh barree -> yeh
        "ک": "ك",  # keheh -> kaf
        "ۀ": "ه",  # heh+yeh -> heh
        "ہ": "ه",  # heh goal -> heh
        "ٔ": None,      # hamza above
    }
)


def persian_normalize(word: str) -> str:
    # the reference chain applies ArabicNormalizationFilter first
    # (PersianAnalyzer.java), then the Persian foldings
    return arabic_normalize(word).translate(_FA_FOLD)


# ---------------------------------------------------------------------------
# Finnish (`fi/FinnishLightStemmer.java`: Savoy's CLEF-2003 light
# stemmer — ä/å/ö fold, recursive -kin/-ko particle strip, case-ending
# tiers with the s-rewrites (nnen→s…, den→s…, hde→ksi), then the two
# normalization passes including the k/p/t geminate collapse).

_FI_VOWELS = set("aeiouy")


def _fi_step1(w: str) -> str:
    if len(w) > 8:
        if w.endswith("kin"):
            return _fi_step1(w[:-3])
        if w.endswith("ko"):
            return _fi_step1(w[:-2])
    if len(w) > 11:
        if w.endswith("dellinen"):
            return w[:-8]
        if w.endswith("dellisuus"):
            return w[:-9]
    return w


def _fi_step2(w: str) -> str:
    if len(w) > 5:
        if w.endswith(("lla", "tse", "sti")):
            return w[:-3]
        if w.endswith("ni"):
            return w[:-2]
        if w.endswith("aa"):
            return w[:-1]
    return w


def _fi_step3(w: str) -> str:
    n = len(w)
    if n > 8:
        if w.endswith("nnen"):
            return w[:-4] + "s"
        if w.endswith("ntena"):
            return w[:-5] + "s"
        if w.endswith("tten"):
            return w[:-4]
        if w.endswith("eiden"):
            return w[:-5]
    if n > 6:
        if w.endswith(("neen", "niin", "seen", "teen", "inen")):
            return w[:-4]
        if w[-3] == "h" and w[-2] in _FI_VOWELS and w[-1] == "n":
            return w[:-3]
        if w.endswith("den"):
            return w[:-3] + "s"
        if w.endswith("ksen"):
            return w[:-4] + "s"
        if w.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return w[:-3]
    if n > 5:
        if w.endswith(("na", "ne")):
            return w[:-2]
        if w.endswith("nei"):
            return w[:-3]
    if n > 4:
        if w.endswith(("ja", "ta")):
            return w[:-2]
        if w[-1] == "a":
            return w[:-1]
        if w[-1] == "n" and w[-2] in _FI_VOWELS:
            return w[:-2]
        if w[-1] == "n":
            return w[:-1]
    return w


def _fi_norm1(w: str) -> str:
    if len(w) > 5 and w.endswith("hde"):
        w = w[:-3] + "ksi"
    if len(w) > 4 and w.endswith(("ei", "at")):
        return w[:-2]
    if len(w) > 3 and w[-1] in "tsjeai":
        return w[:-1]
    return w


def _fi_norm2(w: str) -> str:
    if len(w) > 8 and w[-1] in "eou":
        w = w[:-1]
    if len(w) > 4:
        if w[-1] == "i":
            w = w[:-1]
        if len(w) > 4:
            # collapse runs of k/p/t geminates
            out = [w[0]]
            for c in w[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            w = "".join(out)
    return w


@lru_cache(maxsize=200_000)
def finnish_stem(word: str) -> str:
    if len(word) < 4:
        return word
    w = word.translate(_FI_FOLD)
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(w)))))


_FI_FOLD = str.maketrans({"ä": "a", "å": "a", "ö": "o"})


# ---------------------------------------------------------------------------
# Latvian (`lv/LatvianStemmer.java`: the light version of Kreslins'
# stemmer — first matching affix from the ordered table, guarded by
# whole-word vowel count > the affix's own and stem length ≥ 3, with
# un-palatalization fired only by the marked affixes; the two
# u-only rewrites kš→kst / ņņ→nn inspect the REMOVED suffix's first
# char, exactly like the reference's `s[len]` peek).

# (affix, vowel_count, palatalizes) in the reference's table order
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True), ("e", 1, False),
    ("ā", 1, False), ("ē", 1, False), ("ī", 1, False), ("ū", 1, False),
    ("o", 1, False), ("s", 0, False), ("š", 0, False),
)

_LV_VOWELS = set("aeiouāīēū")


def _lv_unpalatalize(stem: str, removed_first: str) -> str:
    if removed_first == "u":
        if stem.endswith("kš"):
            return stem[:-1] + "st"  # kš -> kst
        if stem.endswith("ņņ"):
            return stem[:-2] + "nn"
    if stem.endswith(("pj", "bj", "mj", "vj")):
        return stem[:-1]
    if stem.endswith("šņ"):
        return stem[:-2] + "sn"
    if stem.endswith("žņ"):
        return stem[:-2] + "zn"
    if stem.endswith("šļ"):
        return stem[:-2] + "sl"
    if stem.endswith("žļ"):
        return stem[:-2] + "zl"
    if stem.endswith("ļņ"):
        return stem[:-2] + "ln"
    if stem.endswith("ļļ"):
        return stem[:-2] + "ll"
    if stem.endswith("č"):
        return stem[:-1] + "c"
    if stem.endswith("ļ"):
        return stem[:-1] + "l"
    if stem.endswith("ņ"):
        return stem[:-1] + "n"
    return stem


@lru_cache(maxsize=200_000)
def latvian_stem(word: str) -> str:
    nv = sum(1 for c in word if c in _LV_VOWELS)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if nv > vc and len(word) >= len(affix) + 3 and word.endswith(affix):
            stem = word[: -len(affix)]
            if palatalizes:
                return _lv_unpalatalize(stem, affix[0])
            return stem
    return word


# ---------------------------------------------------------------------------
# Hungarian (`hu/HungarianLightStemmer.java`: Savoy's UniNE light
# stemmer — accent fold, case endings with the double-consonant
# guards, possessive tiers, plural -k with the a/o/e fallthrough,
# final-vowel normalization).

_HU_FOLD = str.maketrans(
    {
        "á": "a", "ë": "e", "é": "e", "í": "i",
        "ó": "o", "ő": "o", "õ": "o", "ö": "o",
        "ú": "u", "ű": "u", "ũ": "u", "û": "u", "ü": "u",
    }
)
_HU_VOWELS = set("aeiouy")


def _hu_case(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("kent"):
        return w[:-4]
    if n > 5:
        if w.endswith(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                       "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
            return w[:-3]
        if w.endswith(("al", "el")):
            if w[-3] not in _HU_VOWELS and w[-3] == w[-4]:
                return w[:-3]
    if n > 4:
        if w.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                       "be", "ul", "ig")):
            return w[:-2]
        if w.endswith(("on", "en")) and w[-3] not in _HU_VOWELS:
            return w[:-2]
        if w[-1] in "tn":
            return w[:-1]
        if w[-1] in "ae" and w[-2] == w[-3] and w[-2] not in _HU_VOWELS:
            return w[:-2]
    return w


def _hu_possessive(w: str) -> str:
    n = len(w)
    if n > 6:
        if w[-5] not in _HU_VOWELS and w.endswith(("atok", "otok",
                                                   "etek")):
            return w[:-4]
        if w.endswith(("itek", "itok")):
            return w[:-4]
    if n > 5:
        if w[-4] not in _HU_VOWELS and w.endswith(("unk", "tok", "tek")):
            return w[:-3]
        if w[-4] in _HU_VOWELS and w.endswith("juk"):
            return w[:-3]
        if w.endswith("ink"):
            return w[:-3]
    if n > 4:
        if w[-3] not in _HU_VOWELS and w.endswith(("am", "em", "om",
                                                   "ad", "ed", "od",
                                                   "uk")):
            return w[:-2]
        if w[-3] in _HU_VOWELS and w.endswith(("nk", "ja", "je")):
            return w[:-2]
        if w.endswith(("im", "id", "ik")):
            return w[:-2]
    if n > 3:
        if w[-1] in "ae" and w[-2] not in _HU_VOWELS:
            return w[:-1]
        if w[-1] in "md" and w[-2] in _HU_VOWELS:
            return w[:-1]
        if w[-1] == "i":
            return w[:-1]
    return w


def _hu_plural(w: str) -> str:
    if len(w) > 3 and w[-1] == "k":
        if w[-2] in "aoe" and len(w) > 4:
            return w[:-2]
        return w[:-1]  # the reference's intentional fallthrough
    return w


@lru_cache(maxsize=200_000)
def hungarian_stem(word: str) -> str:
    w = word.translate(_HU_FOLD)
    w = _hu_plural(_hu_possessive(_hu_case(w)))
    if len(w) > 3 and w[-1] in "aeio":
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Turkish (`tr/TurkishLowerCaseFilter.java`: dotted/dotless-i-correct
# lowercasing — I → ı unless a combining dot above follows (then i, dot
# consumed), İ → i; `tr/ApostropheFilter.java`: drop the suffix from
# the first apostrophe on. TurkishAnalyzer chains apostrophe →
# lowercase; the Snowball Turkish stemmer is NOT claimed).

import unicodedata as _ud  # noqa: E402


def _tr_before_dot(chars, pos: int) -> bool:
    for j in range(pos, len(chars)):
        if _ud.category(chars[j]) != "Mn":
            return False
        if chars[j] == "̇":
            return True
    return False


def turkish_lowercase(word: str) -> str:
    chars = list(word)
    out = []
    i = 0
    i_or_after = False
    while i < len(chars):
        ch = chars[i]
        i_or_after = ch == "I" or (
            i_or_after and _ud.category(ch) == "Mn"
        )
        if i_or_after:
            if ch == "̇":  # combining dot above: consumed
                i += 1
                continue
            if ch == "I":
                if _tr_before_dot(chars, i + 1):
                    out.append("i")
                else:
                    out.append("ı")
                    i_or_after = False
                i += 1
                continue
        if ch == "İ":
            out.append("i")  # single codepoint, like Java toLowerCase
        else:
            out.append(ch.lower())
        i += 1
    return "".join(out)


def turkish_apostrophe(word: str) -> str:
    # the reference truncates at the FIRST of ' or ’ only
    # (ApostropheFilter.java:49)
    for i, ch in enumerate(word):
        if ch in "'’":
            return word[:i]
    return word


@lru_cache(maxsize=200_000)
def turkish_normalize(word: str) -> str:
    return turkish_lowercase(turkish_apostrophe(word))


# ---------------------------------------------------------------------------
# Sorani Kurdish (ckb/SoraniNormalizer.java:35, ckb/SoraniStemmer.java:20)

_CKB_DIACRITICS = frozenset(
    "ـًٌٍَُِّْ"
)


def sorani_normalize(word: str) -> str:
    """SoraniNormalizer.java:71 ``normalize``: alternate yeh forms →
    FARSI YEH, KAF → KEHEH, heh+ZWNJ / word-final heh / teh marbuta →
    AE, HEH DOACHASHMEE → heh, word-initial reh / reh-with-v-above →
    RREH, harakat + tatweel + format characters deleted. Streaming
    translation: word-final is the original last index (chars after
    ``i`` are untouched when Java tests ``i == len-1``), word-initial
    means nothing emitted yet (earlier deletions emit nothing)."""
    import unicodedata

    out = []
    last = len(word) - 1
    for i, c in enumerate(word):
        if c in ("ي", "ى"):      # yeh / dotless yeh
            out.append("ی")           # farsi yeh
        elif c == "ك":                # kaf
            out.append("ک")           # keheh
        elif c == "‌":                # ZWNJ
            if out and out[-1] == "ه":
                out[-1] = "ە"         # heh+ZWNJ → ae
        elif c == "ه":                # heh
            out.append("ە" if i == last else "ه")
        elif c == "ة":                # teh marbuta
            out.append("ە")
        elif c == "ھ":                # heh doachashmee
            out.append("ه")
        elif c == "ر":                # reh
            out.append("ڕ" if not out else "ر")
        elif c == "ڒ":                # reh with ring above
            out.append("ڕ")
        elif c in _CKB_DIACRITICS:
            pass
        elif unicodedata.category(c) == "Cf":
            pass
        else:
            out.append(c)
    return "".join(out)


def _sorani_stem_core(w: str) -> str:
    """SoraniStemmer.java:30 ``stem``: postposition and possessive
    strips compose; the ezafe/definite/plural/demonstrative suffix
    ladder is a single else-if chain (first match wins)."""
    n = len(w)
    # postposition
    if n > 5 and w.endswith("دا"):            # -dA
        w = w[:-2]; n -= 2
    elif n > 4 and w.endswith("نا"):          # -nA (strips 1)
        w = w[:-1]; n -= 1
    elif n > 6 and w.endswith("ەوە"):    # -awa
        w = w[:-3]; n -= 3
    # possessive pronoun
    if n > 6 and (
        w.endswith("مان")                # -mAn
        or w.endswith("یان")             # -yAn
        or w.endswith("تان")             # -tAn
    ):
        w = w[:-3]; n -= 3
    # indefinite singular ezafe
    if n > 6 and w.endswith("ێکی"):
        return w[:-3]
    if n > 7 and w.endswith("یەکی"):
        return w[:-4]
    # indefinite singular
    if n > 5 and w.endswith("ێک"):
        return w[:-2]
    if n > 6 and w.endswith("یەک"):
        return w[:-3]
    # definite singular
    if n > 6 and w.endswith("ەکە"):
        return w[:-3]
    if n > 5 and w.endswith("کە"):
        return w[:-2]
    # definite plural
    if n > 7 and w.endswith("ەکان"):
        return w[:-4]
    if n > 6 and w.endswith("کان"):
        return w[:-3]
    # indefinite plural ezafe
    if n > 7 and w.endswith("یانی"):
        return w[:-4]
    if n > 6 and w.endswith("انی"):
        return w[:-3]
    # indefinite plural
    if n > 6 and w.endswith("یان"):
        return w[:-3]
    if n > 5 and w.endswith("ان"):
        return w[:-2]
    # demonstrative plural
    if n > 7 and w.endswith("یانە"):
        return w[:-4]
    if n > 6 and w.endswith("انە"):
        return w[:-3]
    # demonstrative singular
    if n > 5 and (
        w.endswith("ایە") or w.endswith("ەیە")
    ):
        return w[:-2]
    if n > 4 and w.endswith("ە"):
        return w[:-1]
    # absolute singular ezafe
    if n > 4 and w.endswith("ی"):
        return w[:-1]
    return w


@lru_cache(maxsize=200_000)
def sorani_stem(word: str) -> str:
    """SoraniAnalyzer.java chain order: normalization precedes
    stemming, so the suffix table (written in KEHEH/AE forms) matches
    text typed with arabic kaf/heh variants too."""
    return _sorani_stem_core(sorani_normalize(word))


# ---------------------------------------------------------------------------
# Bengali (bn/BengaliNormalizer.java:27, bn/BengaliStemmer.java:29)


def bengali_normalize(word: str) -> str:
    """BengaliNormalizer.java:35 ``normalize`` — the UzZaman-Khan
    Double-Metaphone-for-Bangla folds. In-place list translation that
    mirrors the Java buffer/index mechanics exactly (ja-phala and
    ba-phala rules look back at already-rewritten positions and
    re-scan after deletions)."""
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "ঁ":                  # chandrabindu: delete
            del s[i]
            continue
        elif c == "ী":                # dirgho-i kar → rossho-i kar
            s[i] = "ি"
        elif c == "ূ":                # dirgho-u kar → rossho-u kar
            s[i] = "ু"
        elif c == "ক":                # ka + hoshonto + i-kar (khio)
            if i + 2 < len(s) and s[i + 1] == "্" and s[i + 2] == "ি":
                if i == 0:
                    s[i] = "খ"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "খ"
                    del s[i + 2]
        elif c == "ঙ":                # nga → anusvara
            s[i] = "ং"
        elif c == "য":                # ja phala
            if i - 2 == 0 and s[i - 1] == "্":
                s[i - 1] = "ে"
                if i + 1 < len(s) and s[i + 1] == "া":
                    del s[i + 1]
                del s[i]
                continue
            elif i - 1 >= 0 and s[i - 1] == "্":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
        elif c == "ব":                # ba phalaa
            if (i >= 1 and s[i - 1] != "্") or i == 0:
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 5 >= 0 and s[i - 3] == "্":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                continue
        elif c == "ঃ":                # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "হ"
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]
        elif c in ("শ", "ষ"):    # sh forms → sa
            s[i] = "স"
        elif c == "ণ":                # retroflex na → na
            s[i] = "ন"
        elif c in ("ড়", "ঢ়"):    # ra forms
            s[i] = "র"
        elif c == "ৎ":                # khanda-ta → ta
            s[i] = "ত"
        i += 1
    return "".join(s)


# (min_word_len, suffixes) groups extracted verbatim from
# BengaliStemmer.java:33-163 — first matching group wins, stripping
# len(suffix) chars (the source's `return len - k` with k == |suffix|)
_BN_SUFFIX_GROUPS = (
    (9, ("িয়াছিলাম",
         "িতেছিলাম",
         "িতেছিলেন",
         "ইতেছিলেন",
         "িয়াছিলেন",
         "ইয়াছিলেন")),
    (8, ("িতেছিলি",
         "িতেছিলে",
         "িয়াছিলা",
         "িয়াছিলে",
         "িতেছিলা",
         "িয়াছিলি",
         "য়েদেরকে")),
    (7, ("িতেছিস",
         "িতেছেন",
         "িয়াছিস",
         "িয়াছেন",
         "েছিলাম",
         "েছিলেন",
         "েদেরকে")),
    (6, ("িতেছি", "িতেছা",
         "িতেছে", "ছিলাম",
         "ছিলেন", "িয়াছি",
         "িয়াছা", "িয়াছে",
         "েছিলে", "েছিলা",
         "য়েদের", "দেরকে")),
    (5, ("িলাম", "িলেন",
         "িতাম", "িতেন",
         "িবেন", "ছিলি",
         "ছিলে", "ছিলা",
         "তেছে", "িতেছ",
         "খানা", "খানি",
         "গুলো", "গুলি",
         "য়েরা", "েদের")),
    (4, ("লাম", "িলি", "ইলি",
         "িলে", "ইলে", "লেন",
         "িলা", "ইলা", "তাম",
         "িতি", "ইতি", "িতে",
         "ইতে", "তেন", "িতা",
         "িবা", "ইবা", "িবি",
         "ইবি", "বেন", "িবে",
         "ইবে", "ছেন", "য়োন",
         "য়ের", "েরা", "দের")),
    (3, ("িস", "েন", "লি", "লে",
         "লা", "তি", "তে", "তা",
         "বি", "বে", "বা", "ছি",
         "ছা", "ছে", "ুন", "ুক",
         "টা", "টি", "নি", "ের",
         "রা", "কে")),
    (2, ("ি", "ী", "া", "ো", "ে", "ব",
         "ত")),
)


@lru_cache(maxsize=200_000)
def bengali_stem(word: str) -> str:
    """BengaliStemmer.java:30 ``stem`` (Sengupta-Chaudhuri verb-phrase
    suffixes + Savoy light criteria): longest-group-first, one strip."""
    n = len(word)
    for min_len, sufs in _BN_SUFFIX_GROUPS:
        if n > min_len:
            for suf in sufs:
                if word.endswith(suf):
                    return word[: n - len(suf)]
    return word


# ---------------------------------------------------------------------------
# dispatch (Greek lives in `analysis/greek.py` — the Ntais/Saroukos
# 22-rule stemmer is big enough for its own module — but dispatches
# from here so one UDF surface covers all the rule-stemmer languages)

from lucene_spark.analysis.greek import greek_stem  # noqa: E402

LIGHT_LANGS = ("ar", "bg", "bn", "ckb", "cz", "el", "fa", "fi", "hi",
               "hu", "id", "lv", "tr")

_DISPATCH = {
    "ar": arabic_stem,
    "bg": bulgarian_stem,
    "bn": bengali_stem,
    "ckb": sorani_stem,
    "cz": czech_stem,
    "el": greek_stem,
    "fa": persian_normalize,
    "fi": finnish_stem,
    "hi": hindi_stem,
    "hu": hungarian_stem,
    "id": indonesian_stem,
    "lv": latvian_stem,
    "tr": turkish_normalize,
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
    "bg": frozenset(
        """и в на с за от по но или а да не се е като че тази този то
        така само може при още обаче би което той тя ние вие те""".split()
    ),
    "cz": frozenset(
        """a aby ale ani až bez by co či do i jak je jeho jen ještě ji
        k kde kdy která které který ma mezi na nebo není o od pak po
        pro proti se si tak také ten to u už v ve z za že""".split()
    ),
    "fa": frozenset(
        """و در به از که این را با است برای آن یک خود تا بر هم نیز اما
        یا هر ما من او شود شد های""".split()
    ),
    "el": frozenset(
        """ο η το οι τα του τησ των τον την και κι να δε δεν μη μην με
        σε απο για προσ θα που πωσ αυτοσ αυτη αυτο ειναι""".split()
    ),
    "fi": frozenset(
        """ja ei on en se että oli hän ole mutta niin kun myös jos tai
        vain ovat kuin mitä tämä nyt sen ne joka sitä""".split()
    ),
    "lv": frozenset(
        """un ir es tu viņš kas ar uz no par pie bet ka vai šis tas
        tā būt viņa mēs jūs tie""".split()
    ),
    "ckb": frozenset(
        """و کە ی کرد ئەوەی سەر دوو هەروەها لەو دەکات چەند
        هەر ئەو ئەم""".split()
    ),
    "bn": frozenset(
        """এই ও থেকে করে এ না ওই নিয়ে করা বলেন সঙ্গে যে তা আর
        কোনো বলে সেই দিন হয় কি পরে সব মধ্যে এর শুরু কাজ কিছু কাছে সে
        তবে বা আগে""".split()
    ),
}


def light_analyze(lang: str):
    """Callable analyzer for ``InvertedIndex.build(analyzer=...)``:
    UAX#29 tokenize → lowercase → per-language stopset → light stem —
    the ArabicAnalyzer/HindiAnalyzer/…-analog chains (each reference
    analyzer composes exactly tokenizer + lowercase + stop + its
    stemmer/normalizer). Positions are pre-stop ordinals, same
    contract as `snowball.snowball_analyze`.

    For ``tr`` the chain lowercases with the dotted/dotless-i rules
    (apostrophe strip included via `turkish_normalize`) instead of
    plain ``str.lower``, like the reference's TurkishAnalyzer."""
    from typing import List, Tuple

    from lucene_spark.analysis.uax29 import uax29_tokenize

    stop = LIGHT_STOP.get(lang, frozenset())
    fn = _DISPATCH[lang]
    if lang == "bn":
        # BengaliAnalyzer.java chain: IndicNormalizationFilter →
        # BengaliNormalizationFilter → BengaliStemFilter (the stemmer
        # itself, unlike ar/hi/ckb, does not normalize — its unit
        # fixtures are stem-only)
        from lucene_spark.analysis.indic import indic_normalize

        def fn(w, _stem=bengali_stem, _in=indic_normalize):  # noqa: F811
            return _stem(bengali_normalize(_in(w)))
    elif lang == "hi":
        # HindiAnalyzer.java chain applies IndicNormalizationFilter
        # before HindiNormalizationFilter (hindi_stem normalizes)
        from lucene_spark.analysis.indic import indic_normalize

        def fn(w, _stem=hindi_stem, _in=indic_normalize):  # noqa: F811
            return _stem(_in(w))

    def _an(text: str) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for pos, tok in enumerate(uax29_tokenize(text)):
            t = turkish_normalize(tok) if lang == "tr" else tok.lower()
            if t and t not in stop:
                out.append((fn(t) if lang != "tr" else t, pos))
        return out

    _an.__name__ = f"light_{lang}_analyze"
    return _an


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
