"""ComplexPhraseQueryParser: phrases with embedded multi-term elements.

Re-expression of
`queryparser/src/java/org/apache/lucene/queryparser/complexPhrase/
ComplexPhraseQueryParser.java`: inside a quoted phrase, elements may be
wildcards (``ha*``, ``h?sh``), fuzzy terms (``hash~1``), or
parenthesized alternations (``(join merge)``); the phrase rewrites to
a SpanNearQuery whose slots are SpanOr of the expanded SpanTermQueries
(`ComplexPhraseQuery.rewrite`), ordered with the phrase's slop
(``"..."~N``; the parser's ``inOrder`` flag defaults to true).

Spark shape: each slot expands against the term dictionary with the
same BOUNDED probe the multi-term rewrite uses (``limit(cap+1)``,
TooManyClauses above the cap), then
:func:`lucene_spark.search.spans.span_near_multi_docs` runs the
ordered position join — per-slot decodes read only the expanded
terms' blocks and all position predicates evaluate in codegen.
"""

from __future__ import annotations

import re
from typing import List

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search.query import (
    FuzzyQuery,
    TooManyClauses,
    WildcardQuery,
    probe_term_set,
)
from lucene_spark.search.spans import span_near_multi_docs

__all__ = ["parse_complex_phrase", "complex_phrase_docs"]

_FUZZY = re.compile(r"^(?P<t>[^~]+)~(?P<n>\d*)$")


def parse_complex_phrase(phrase: str) -> List[List[str]]:
    """Phrase body → list of slots, each a list of raw elements.

    ``ha* (join merge) slow`` → [[ha*], [join, merge], [slow]].
    Unbalanced parens raise like the reference's ParseException.
    """
    slots: List[List[str]] = []
    i, n = 0, len(phrase)
    while i < n:
        if phrase[i].isspace():
            i += 1
            continue
        if phrase[i] == "(":
            j = phrase.find(")", i)
            if j < 0:
                raise ValueError(f"unbalanced '(' in complex phrase: {phrase!r}")
            group = [t for t in phrase[i + 1 : j].replace(" OR ", " ").split() if t]
            if not group:
                raise ValueError(f"empty group in complex phrase: {phrase!r}")
            slots.append(group)
            i = j + 1
        else:
            j = i
            while j < n and not phrase[j].isspace() and phrase[j] != "(":
                j += 1
            slots.append([phrase[i:j]])
            i = j
    return slots


def _expand_element(index: InvertedIndex, el: str) -> List[str]:
    """One raw phrase element → matching dictionary terms, via the
    SAME bounded probe the multi-term rewrite uses
    (:func:`lucene_spark.search.query.probe_term_set`)."""
    m = _FUZZY.match(el)
    if m and not ("*" in el or "?" in el):
        q = FuzzyQuery(m.group("t"), max_edits=int(m.group("n") or 2))
    elif "*" in el or "?" in el:
        q = WildcardQuery(el)
    else:
        return [el]
    matched = probe_term_set(q, index.terms)
    if matched is None:
        raise TooManyClauses(
            f"complex-phrase element {el!r} matched > maxClauseCount terms"
        )
    return sorted(matched)


def complex_phrase_docs(
    index: InvertedIndex, phrase: str, slop: int = 0, in_order: bool = True
):
    """DataFrame(doc_id) matching the complex phrase (constant score,
    the match-set semantics of the rewritten SpanNearQuery)."""
    slot_terms = [
        _expand_element(index, el[0]) if len(el) == 1 else sorted(
            {t for e in el for t in _expand_element(index, e)}
        )
        for el in parse_complex_phrase(phrase)
    ]
    if len(slot_terms) == 1:
        # single element degenerates to a term/multi-term match
        from pyspark.sql import functions as F

        from lucene_spark.search.positional import decode_positions

        if not slot_terms[0]:
            return index.spark.createDataFrame([], "doc_id long")
        docs = (
            decode_positions(index, slot_terms[0]).select("doc_id").distinct()
        )
        hidden = index.hidden_docs
        if hidden is not None:
            docs = docs.join(hidden, "doc_id", "left_anti")
        return docs
    return span_near_multi_docs(index, slot_terms, slop, in_order)
