"""Character-normalization token filters: the Lucene-analog pack for
German umlaut/e-deletion, Scandinavian interchange + folding, Serbian
cyrillic→latin, Irish prothesis-aware lowercase, and elision stripping.

Reference parity (analysis/common/src/java/org/apache/lucene/analysis/...):

- ``german_normalize``   — de/GermanNormalizationFilter.java:41 (3-state
  FSM: ß→ss, ä/ö/ü→a/o/u, ae/oe→a/o, ue→u unless after vowel/q).
- ``scandinavian_normalize`` — miscellaneous/ScandinavianNormalizer.java:32
  with ALL_FOLDINGS (ä/Ä→æ/Æ, ö/Ö→ø/Ø, aa|aA→å, ao|aO→å, ae|aE→æ,
  oe|oE|oo|oO→ø, case-preserving on the first letter).
- ``scandinavian_fold``  — miscellaneous/ScandinavianFoldingFilter.java:56
  (å/ä/æ→a, ö/ø→o, and the second vowel of aa/ae/ao/oe/oo deleted).
- ``serbian_normalize``  — sr/SerbianNormalizationFilter.java:32
  (cyrillic→latin with dj/lj/nj/dz digraph expansion; also folds the
  latin š/ž/č/ć/đ diacritics).
- ``irish_lowercase``    — ga/IrishLowerCaseFilter.java:28 (t-prothesis
  and n-eclipsis: ``nAthair``→``n-athair``, then lowercase).
- ``elision``            — util/ElisionFilter.java:31 with the per-language
  DEFAULT_ARTICLES sets of FrenchAnalyzer.java:56, ItalianAnalyzer.java:48,
  CatalanAnalyzer.java:49, IrishAnalyzer.java:48 (strip ``l'``/``qu'``/…
  before the first ASCII or typographic apostrophe, case-insensitive).

All functions are pure ``str → str`` so they compose into analyzer
chains and ship to executors as Arrow-batched pandas UDFs — the hot
path stays one Python call per *unique* token (callers memoize), and
the Spark plan stays a single narrow projection (no shuffle).
"""

from __future__ import annotations

from typing import FrozenSet

import pandas as pd

__all__ = [
    "german_normalize",
    "scandinavian_normalize",
    "scandinavian_fold",
    "serbian_normalize",
    "romanian_normalize",
    "irish_lowercase",
    "elision",
    "ELISION_ARTICLES",
    "NORMALIZE_KINDS",
    "normalize_token",
    "normalize_udf",
]


def german_normalize(word: str) -> str:
    """GermanNormalizationFilter.java:54 FSM: states N (ordinary),
    V (vowel — blocks 'u' from re-entering the umlaut state), U
    (umlaut state — a following 'e' is deleted, i.e. ae→a, oe→o,
    ue→u-not-after-vowel/q)."""
    N, V, U = 0, 1, 2
    state = N
    out = []
    for c in word:
        if c in ("a", "o"):
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state != U:
                out.append(c)
            state = V
        elif c in ("i", "q", "y"):
            out.append(c)
            state = V
        elif c == "ä":  # ä
            out.append("a")
            state = V
        elif c == "ö":  # ö
            out.append("o")
            state = V
        elif c == "ü":  # ü
            out.append("u")
            state = V
        elif c == "ß":  # ß
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


_ALL_FOLDINGS = frozenset({"AA", "AO", "AE", "OE", "OO"})


def scandinavian_normalize(
    word: str, foldings: FrozenSet[str] = _ALL_FOLDINGS
) -> str:
    """ScandinavianNormalizer.java:75 processToken with a configurable
    folding set (the per-language Norwegian/Danish/Swedish filters pass
    subsets; ScandinavianNormalizationFilter passes ALL_FOLDINGS)."""
    buf = list(word)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c == "ä":  # ä → æ
            buf[i] = "æ"
        elif c == "Ä":  # Ä → Æ
            buf[i] = "Æ"
        elif c == "ö":  # ö → ø
            buf[i] = "ø"
        elif c == "Ö":  # Ö → Ø
            buf[i] = "Ø"
        elif i + 1 < len(buf):
            n = buf[i + 1]
            if c == "a" and (
                ("AA" in foldings and n in "aA")
                or ("AO" in foldings and n in "oO")
            ):
                del buf[i + 1]
                buf[i] = "å"  # å
            elif c == "A" and (
                ("AA" in foldings and n in "aA")
                or ("AO" in foldings and n in "oO")
            ):
                del buf[i + 1]
                buf[i] = "Å"  # Å
            elif c == "a" and "AE" in foldings and n in "eE":
                del buf[i + 1]
                buf[i] = "æ"  # æ
            elif c == "A" and "AE" in foldings and n in "eE":
                del buf[i + 1]
                buf[i] = "Æ"  # Æ
            elif c == "o" and (
                ("OE" in foldings and n in "eE")
                or ("OO" in foldings and n in "oO")
            ):
                del buf[i + 1]
                buf[i] = "ø"  # ø
            elif c == "O" and (
                ("OE" in foldings and n in "eE")
                or ("OO" in foldings and n in "oO")
            ):
                del buf[i + 1]
                buf[i] = "Ø"  # Ø
        i += 1
    return "".join(buf)


def scandinavian_fold(word: str) -> str:
    """ScandinavianFoldingFilter.java:68: å/ä/æ→a, ö/ø→o (case kept),
    and for double vowels aa/ae/ao and oe/oo the second is deleted."""
    buf = list(word)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in "åäæ":  # å ä æ
            buf[i] = "a"
        elif c in "ÅÄÆ":  # Å Ä Æ
            buf[i] = "A"
        elif c in "øö":  # ø ö
            buf[i] = "o"
        elif c in "ØÖ":  # Ø Ö
            buf[i] = "O"
        elif i + 1 < len(buf):
            n = buf[i + 1]
            if c in "aA" and n in "aAeEoO":
                del buf[i + 1]
            elif c in "oO" and n in "eEoO":
                del buf[i + 1]
        i += 1
    return "".join(buf)


# SerbianNormalizationFilter.java:46 switch, flattened: cyrillic→latin
# plus the latin diacritic folds the same filter applies (đ/ž/č/ć/š).
_SR_MAP = {
    "а": "a", "б": "b", "в": "v", "г": "g",
    "д": "d", "ђ": "dj", "đ": "dj", "е": "e",
    "ж": "z", "з": "z", "ž": "z", "и": "i",
    "ј": "j", "к": "k", "л": "l", "љ": "lj",
    "м": "m", "н": "n", "њ": "nj", "о": "o",
    "п": "p", "р": "r", "с": "s", "т": "t",
    "ћ": "c", "ц": "c", "ч": "c", "č": "c",
    "ć": "c", "у": "u", "ф": "f", "х": "h",
    "џ": "dz", "ш": "s", "š": "s",
}


def romanian_normalize(word: str) -> str:
    """RomanianNormalizer (ro/RomanianNormalizer.java:28): legacy
    cedilla forms of s/t fold to the correct comma-below letters
    (U+015E/15F/162/163 -> U+0218/219/21A/21B)."""
    return (
        word.replace("\u015e", "\u0218")
        .replace("\u015f", "\u0219")
        .replace("\u0162", "\u021a")
        .replace("\u0163", "\u021b")
    )


def serbian_normalize(word: str) -> str:
    return "".join(_SR_MAP.get(c, c) for c in word)


_GA_UPPER_VOWELS = frozenset("AEIOUÁÉÍÓÚ")


def irish_lowercase(word: str) -> str:
    """IrishLowerCaseFilter.java:38: an initial n/t before an upper
    vowel is kept and hyphen-joined (eclipsis/prothesis markers), the
    rest is lowercased — ``nAthair``→``n-athair``, ``hARD``→``hard``."""
    if len(word) > 1 and word[0] in "nt" and word[1] in _GA_UPPER_VOWELS:
        return word[0] + "-" + word[1:].lower()
    return word.lower()


# DEFAULT_ARTICLES of the four reference analyzers that compose
# ElisionFilter (all constructed with ignoreCase=true).
ELISION_ARTICLES = {
    "fr": frozenset(
        "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
    ),
    "it": frozenset(
        "c l all dall dell nell sull coll pell gl agl dagl degl negl "
        "sugl un m t s v d".split()
    ),
    "ca": frozenset("d l m n s t".split()),
    "ga": frozenset("d m b".split()),
}


def elision(word: str, lang: str = "fr") -> str:
    """ElisionFilter.java:49: find the FIRST apostrophe (ASCII ``'`` or
    typographic ``’``); if the prefix before it is in the article
    set (case-insensitive), strip prefix+apostrophe, else keep the
    token whole (``l'avion``→``avion`` but ``O'brian`` stays)."""
    articles = ELISION_ARTICLES[lang]
    for i, ch in enumerate(word):
        if ch == "'" or ch == "’":
            if word[:i].lower() in articles:
                return word[i + 1 :]
            return word
    return word


NORMALIZE_KINDS = {
    "de_norm": german_normalize,
    "scn_norm": scandinavian_normalize,
    "scn_fold": scandinavian_fold,
    "sr_norm": serbian_normalize,
    "ga_lower": irish_lowercase,
    "elision_fr": lambda w: elision(w, "fr"),
    "elision_it": lambda w: elision(w, "it"),
    "elision_ca": lambda w: elision(w, "ca"),
    "ro": romanian_normalize,
    "te_norm": None,  # bound below (circular-import-free lazy import)
    "te_stem": None,
    "elision_ga": lambda w: elision(w, "ga"),
}


def _te_norm(w):
    from .indic import telugu_normalize

    return telugu_normalize(w)


def _te_stem(w):
    from .indic import telugu_normalize, telugu_stem

    return telugu_stem(telugu_normalize(w))


NORMALIZE_KINDS["te_norm"] = _te_norm
NORMALIZE_KINDS["te_stem"] = _te_stem


def normalize_token(kind: str, word: str) -> str:
    try:
        fn = NORMALIZE_KINDS[kind]
    except KeyError:
        raise ValueError(f"unknown normalization kind {kind!r}")
    return fn(word)


def normalize_udf(kind: str):
    """Arrow-batched normalize column: string → string. One narrow
    projection, no shuffle; at 100 TB this runs map-side inside the
    same stage as tokenization."""
    from pyspark.sql.functions import pandas_udf

    fn = NORMALIZE_KINDS[kind]

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(lambda t: fn(t) if isinstance(t, str) else t)

    return _norm
