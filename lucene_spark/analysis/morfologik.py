"""Morfologik dictionary-driven lemmatization (Polish) analog.

Reference parity targets:
  - lucene/analysis/morfologik/src/java/org/apache/lucene/analysis/morfologik/MorfologikFilter.java:51
    (DictionaryLookup over the binary FSA dictionary; for each input
    token: exact surface lookup, then per-codepoint-lowercased lookup;
    on a hit ALL lemma interpretations are emitted at the SAME position
    (posIncrement 0 after the first), each carrying its morphosyntactic
    tag list; keyword-marked and unknown tokens pass through unchanged
    with cleared tags)
  - MorfologikFilter.java:76 (``lemmaSplitter``: a lemma's concatenated
    tag string splits on '+' or '|' into the tag list)
  - MorphosyntacticTagsAttribute.java:28 (tags attribute contract)
  - MorfologikAnalyzer.java:41 (standard tokenizer -> MorfologikFilter
    chain)

The reference's dictionary is the morfologik-polish binary FSA (~3.5M
surface forms).  That blob cannot ship here, so the in-repo dictionary
is a compact hand-built lexicon over the same NKJP-style tagset that
exercises every filter behavior — AMBIGUOUS surface forms with multiple
lemma interpretations, case-sensitive-then-lowercase lookup, '+'-joined
tag strings — and ``morfologik_lookup`` accepts any user-supplied
``dict[str, list[(lemma, tagstring)]]`` for a real dictionary.

Spark-first: the dictionary is a broadcast map inside one Arrow pass;
emitting multiple lemmas per token is an ``explode`` over the per-token
interpretation array — no shuffle, no per-row Python.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

__all__ = [
    "POLISH_DICT",
    "morfologik_lookup",
    "morfologik_analyze",
    "morfologik_lemmas_udf",
]

# Tag strings use the NKJP-style positional tagset the morfologik-polish
# dictionary ships (publicly documented: subst=noun, adj, verb fin,
# praet=past, inf, num, case:number:gender).  '+' joins multi-segment
# tags exactly like the reference dictionary's concatenated encoding.
POLISH_DICT: Dict[str, List[Tuple[str, str]]] = {
    # ambiguous: "mamy" = "we have" (mieć) OR "mothers/mom's" (mama)
    "mamy": [("mieć", "verb:fin:pl:pri:imperf"), ("mama", "subst:pl:nom:f+subst:sg:gen:f")],
    # ambiguous: "drogi" = "roads / of-the-road" (droga) OR "dear" (drogi)
    "drogi": [("droga", "subst:pl:nom:f+subst:sg:gen:f"), ("drogi", "adj:sg:nom:m1")],
    # ambiguous: "piła" = "she drank" (pić) OR "a saw" (piła)
    "piła": [("pić", "verb:praet:sg:f:imperf"), ("piła", "subst:sg:nom:f")],
    "studenta": [("student", "subst:sg:gen:m1+subst:sg:acc:m1")],
    "studenci": [("student", "subst:pl:nom:m1")],
    "studentów": [("student", "subst:pl:gen:m1+subst:pl:acc:m1")],
    "książki": [("książka", "subst:pl:nom:f+subst:sg:gen:f")],
    "książek": [("książka", "subst:pl:gen:f")],
    "miasta": [("miasto", "subst:sg:gen:n+subst:pl:nom:n")],
    "miastach": [("miasto", "subst:pl:loc:n")],
    "czytają": [("czytać", "verb:fin:pl:ter:imperf")],
    "czytał": [("czytać", "verb:praet:sg:m1:imperf")],
    "pisze": [("pisać", "verb:fin:sg:ter:imperf")],
    "napisał": [("napisać", "verb:praet:sg:m1:perf")],
    "dzieci": [("dziecko", "subst:pl:nom:n+subst:pl:gen:n")],
    "ludzie": [("człowiek", "subst:pl:nom:m1")],
    "ludzi": [("człowiek", "subst:pl:gen:m1+subst:pl:acc:m1")],
    "wielki": [("wielki", "adj:sg:nom:m1")],
    "wielka": [("wielki", "adj:sg:nom:f")],
    "nowego": [("nowy", "adj:sg:gen:m1+adj:sg:acc:m1")],
    "dobrze": [("dobrze", "adv:pos")],
    "polska": [("polska", "subst:sg:nom:f"), ("polski", "adj:sg:nom:f")],
    "warszawie": [("warszawa", "subst:sg:loc:f+subst:sg:dat:f")],
    "je": [("jeść", "verb:fin:sg:ter:imperf"), ("on", "ppron3:pl:acc:n")],
    "lat": [("rok", "subst:pl:gen:m3"), ("lato", "subst:pl:gen:n")],
}

_lemma_splitter = re.compile(r"\+|\|")


def morfologik_lookup(
    word: str, dictionary: Optional[Dict[str, List[Tuple[str, str]]]] = None
) -> Optional[List[Tuple[str, List[str]]]]:
    """MorfologikFilter.incrementToken lookup order: exact surface form,
    then per-codepoint lowercase.  Returns [(lemma, [tags...]), ...] or
    None when the dictionary has no interpretation."""
    d = POLISH_DICT if dictionary is None else dictionary
    hits = d.get(word)
    if hits is None:
        hits = d.get(word.lower())
    if hits is None:
        return None
    return [(lemma, _lemma_splitter.split(tag)) for lemma, tag in hits]


def morfologik_analyze(
    text: str,
    keywords: frozenset = frozenset(),
    dictionary: Optional[Dict[str, List[Tuple[str, str]]]] = None,
) -> List[Tuple[int, str, List[str]]]:
    """MorfologikAnalyzer chain: tokenize, then for each token emit all
    dictionary interpretations at ONE position (the filter's
    posIncrement-0 stacking), or the surface form with no tags when the
    token is keyword-marked or unknown.

    Returns (position, lemma_or_surface, tags) rows.
    """
    from .analyzer import tokenize

    out: List[Tuple[int, str, List[str]]] = []
    for pos, tok in enumerate(tokenize(text)):
        if tok not in keywords:
            hits = morfologik_lookup(tok, dictionary)
            if hits is not None:
                out.extend((pos, lemma, tags) for lemma, tags in hits)
                continue
        out.append((pos, tok, []))
    return out


def morfologik_lemmas_udf():
    """pandas_udf: word column → array<struct<lemma,tags>> (broadcast
    dictionary captured in the closure; one Arrow pass, no shuffle —
    multi-lemma stacking becomes a JVM ``explode`` downstream)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _lookup(s):
        def one(w):
            if not isinstance(w, str):
                return []
            hits = morfologik_lookup(w)
            if hits is None:
                return [(w, [])]
            return hits

        return s.map(one)

    _lookup.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(
        _lookup, "array<struct<lemma:string,tags:array<string>>>"
    )
