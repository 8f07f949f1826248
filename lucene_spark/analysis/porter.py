"""Porter stemmer + English analysis chain.

Implements M.F. Porter's 1980 suffix-stripping algorithm ("An algorithm
for suffix stripping", Program 14(3)) with the two classic departures
Lucene's implementation documents
(`lucene/core/src/java/org/apache/lucene/analysis/en/PorterStemmer.java`):
``bli→ble`` (instead of the paper's ``abli→able``) and the added
``logi→log`` rule. Words of length <= 2 are returned unchanged, as in
the reference implementation.

The English chain (:func:`english_analyze`) mirrors
`analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:108-118`:
StandardTokenizer → EnglishPossessiveFilter (strip trailing ``'s``,
`en/EnglishPossessiveFilter.java:54-60`, apostrophe variants ' ’ ʼ) →
LowerCaseFilter → StopFilter → PorterStemFilter.

Stemming is pure string work; the indexing path batches it per Arrow
chunk and memoizes per unique token (Zipf makes the hit rate ~99% on
web text), so the hot loop stays off the per-token slow path.
"""

from __future__ import annotations

from collections import Counter
from functools import lru_cache
from typing import List, Tuple

import pandas as pd
from pyspark.sql import functions as F

from lucene_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    _simple_lower_table,
    simple_lowercase,
    tokenize,
)

__all__ = [
    "porter_stem",
    "porter_stem_udf",
    "strip_possessive",
    "english_analyze",
    "english_term_freqs",
]


def porter_stem_udf():
    """pandas_udf: word column → Porter stem (Arrow-batched, memoized
    per unique token via the lru_cache on :func:`porter_stem`)."""

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(porter_stem)

    return _stem

_VOWELS = frozenset("aeiou")


def _cons(word: str, i: int) -> bool:
    """True when word[i] is a consonant (y is a consonant only when it
    follows a vowel-position... per Porter: y after a consonant is a
    vowel; y at start or after a vowel is a consonant)."""
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in [C](VC){m}[V]."""
    m, i, n = 0, 0, len(stem)
    while i < n and _cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o: ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(word) < 3:
        return False
    n = len(word)
    return (
        _cons(word, n - 3)
        and not _cons(word, n - 2)
        and _cons(word, n - 1)
        and word[-1] not in "wxy"
    )


# (suffix, replacement, min_measure) rule tables for steps 2 and 3
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"),  # DEPARTURE: paper has abli→able
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),  # DEPARTURE: added rule
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


@lru_cache(maxsize=1 << 17)
def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w, fired = w[:-2], True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w, fired = w[:-3], True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


_APOSTROPHES = ("'s", "’s", "ʼs")


def strip_possessive(token: str) -> str:
    """EnglishPossessiveFilter: drop a trailing 's (any apostrophe form).

    Applied post-lowercase here; the filter is case-preserving in
    Lucene but runs pre-lowercase there — the compositions agree.
    """
    for suf in _APOSTROPHES:
        if token.endswith(suf):
            return token[:-2]
    return token


def english_analyze(
    text: str, stopwords: frozenset = ENGLISH_STOP_WORDS
) -> List[Tuple[str, int]]:
    """tokenize → possessive strip → lowercase → stop → Porter.

    Positions are pre-stop ordinals (StopFilter keeps increments),
    matching :func:`lucene_spark.analysis.analyzer.analyze`.
    """
    out: List[Tuple[str, int]] = []
    for pos, tok in enumerate(tokenize(simple_lowercase(text))):
        tok = strip_possessive(tok)
        if tok and tok not in stopwords:
            out.append((porter_stem(tok), pos))
    return out


def english_term_freqs(text: str, stopwords: frozenset = ENGLISH_STOP_WORDS):
    """(term→freq, dl) for the english chain — hot path, C-level passes
    plus one memoized stem per unique token (see module docstring)."""
    from lucene_spark.analysis.analyzer import MAX_TOKEN_LENGTH

    from lucene_spark.analysis.uax29 import uax29_tokenize

    toks = uax29_tokenize(text.translate(_simple_lower_table()))
    cnt = Counter(toks)
    # over-long tokens split, not dropped (StandardTokenizer:152-168)
    for t in [t for t in cnt if len(t) > MAX_TOKEN_LENGTH]:
        n = cnt.pop(t)
        for i in range(0, len(t), MAX_TOKEN_LENGTH):
            piece = t[i : i + MAX_TOKEN_LENGTH]
            cnt[piece] = cnt.get(piece, 0) + n
    out: dict = {}
    dl = 0
    for tok, f in cnt.items():
        tok = strip_possessive(tok)
        if not tok or tok in stopwords:
            continue
        dl += f
        stem = porter_stem(tok)
        out[stem] = out.get(stem, 0) + f
    return out, dl
