"""WikipediaTokenizer analog — wiki-markup-aware typed tokenization.

Reference: `lucene/analysis/common/src/java/org/apache/lucene/analysis/
wikipedia/WikipediaTokenizer.java:52` (the JFlex scanner
`WikipediaTokenizerImpl.jflex`).  Tokens carry the construct they came
from as their type: internal links ``il``, external links ``el`` with
the URL itself ``elu``, categories ``c``, citations ``ci``, bold ``b``,
italics ``i``, bold-italics ``bi``, headings ``h``/``sh``; plain text
words type as ``<ALPHANUM>`` / ``<NUM>`` / ``<APOSTROPHE>`` (the
classic-grammar subset the reference tests exercise).

Behavioral corners pinned from ``TestWikipediaTokenizer.java``:

- ``[[Category:foo]]`` / ``[[:Category:...]]`` → inner words typed
  ``c``; ``[[link|display info]]`` → ALL inner words typed ``il``.
- ``[http://url display words]`` → URL token ``elu`` then display
  words ``el``, the FIRST display word at position increment 0
  (overlapping the URL — testLinkPhrases' ``{..., 1, 0, 1, ...}``).
- Quote runs toggle a state: ``''`` italics, ``'''`` bold, ``'''''``
  bold-italics.  A bracket construct INSIDE an open quote ends the
  quote's typing (words after it are plain) but leaves the run
  pending, so the next quote run CLOSES rather than reopens —
  reproducing ``''[[Category:ital_cat]]''  here`` → ``here`` plain,
  and ``'''same [[Category:foo]] goes`` → ``same`` bold, ``goes``
  plain (testHandwritten).
- ``==h==`` → ``h``; ``===s h===`` → ``sh``; unmatched ``=`` runs are
  markup noise.
- ``<ref>x</ref>`` → ``ci``; every other HTML tag is stripped.
- Token modes (`WikipediaTokenizer.java:108-118`): TOKENS_ONLY (0),
  UNTOKENIZED_ONLY (1), BOTH (2) with an ``untokenized_types`` set;
  the untokenized span token is the RAW inner substring (inner spaces
  preserved), carries flag UNTOKENIZED_TOKEN_FLAG=1, and in BOTH mode
  the first split word overlaps it at position increment 0.

Spark entry: :func:`wikipedia_tokenizer_udf` — one Arrow-batched
pandas UDF (per-doc Python inside the batch, no per-row Spark UDF),
embarrassingly parallel over doc partitions, no shuffle.
"""

from __future__ import annotations

import re
from typing import FrozenSet, Iterable, List

import pandas as pd

__all__ = [
    "TOKENS_ONLY",
    "UNTOKENIZED_ONLY",
    "BOTH",
    "UNTOKENIZED_TOKEN_FLAG",
    "INTERNAL_LINK",
    "EXTERNAL_LINK",
    "EXTERNAL_LINK_URL",
    "CITATION",
    "CATEGORY",
    "BOLD",
    "ITALICS",
    "BOLD_ITALICS",
    "HEADING",
    "SUB_HEADING",
    "wikipedia_tokenize",
    "wikipedia_tokenizer_udf",
    "wiki_plain_text_col",
]

TOKENS_ONLY = 0
UNTOKENIZED_ONLY = 1
BOTH = 2
UNTOKENIZED_TOKEN_FLAG = 1

INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"
ALPHANUM = "<ALPHANUM>"
NUM = "<NUM>"
APOSTROPHE = "<APOSTROPHE>"

# classic-grammar word subset: apostrophe forms, dotted numbers, runs
# of letters/digits (underscore and $ are delimiters, unlike UAX#29)
_WORD = re.compile(r"[A-Za-z0-9]+(?:'[A-Za-z0-9]+)+|\d+(?:\.\d+)+|[A-Za-z0-9]+")
_QUOTES = re.compile(r"''+")
_EXTERNAL = re.compile(r"\[(?:https?|ftp)://")
_REF_OPEN = re.compile(r"<ref[^>/]*>", re.IGNORECASE)
_TAG = re.compile(r"</?[A-Za-z][^>]*>")
_EQ_RUN = re.compile(r"=+")


def _plain_type(word: str) -> str:
    if "'" in word:
        return APOSTROPHE
    if re.fullmatch(r"\d+(?:\.\d+)+", word):
        return NUM
    return ALPHANUM


class _Emitter:
    def __init__(self, text: str, mode: int, untok: FrozenSet[str]):
        self.text = text
        self.mode = mode
        self.untok = untok
        self.out: List[dict] = []
        self.pos = -1

    def word(self, term: str, ttype: str, start: int, end: int, inc: int = 1, flags: int = 0):
        self.pos += inc
        self.out.append(
            {
                "term": term,
                "type": ttype,
                "pos": self.pos,
                "start": start,
                "end": end,
                "flags": flags,
            }
        )

    def construct(self, ttype: str, words, first_inc: int = 1):
        """Emit a markup construct's words under the mode/untok rules.

        words: [(term, start, end)]; first_inc lets the external-link
        display overlap its URL (increment 0 on the first word).
        """
        if not words:
            return
        untokenized = self.mode != TOKENS_ONLY and ttype in self.untok
        if untokenized:
            span = self.text[words[0][1] : words[-1][2]]
            self.word(
                span, ttype, words[0][1], words[-1][2],
                inc=first_inc, flags=UNTOKENIZED_TOKEN_FLAG,
            )
            if self.mode == UNTOKENIZED_ONLY:
                return
            # BOTH: splits follow, first overlapping the span
            for j, (term, s, e) in enumerate(words):
                self.word(term, ttype, s, e, inc=0 if j == 0 else 1)
        else:
            for j, (term, s, e) in enumerate(words):
                self.word(term, ttype, s, e, inc=first_inc if j == 0 else 1)


def _words_in(text: str, lo: int, hi: int):
    return [(m.group(0), m.start(), m.end()) for m in _WORD.finditer(text, lo, hi)]


def wikipedia_tokenize(
    text: str,
    mode: int = TOKENS_ONLY,
    untokenized_types: Iterable[str] = (),
) -> List[dict]:
    """Tokenize wiki markup → [{term, type, pos, start, end, flags}]."""
    untok = frozenset(untokenized_types)
    em = _Emitter(text, mode, untok)
    n = len(text)
    i = 0
    # open_quote: a pending quote run's type; quote_typing: whether
    # words still take that type (a bracket construct turns typing off
    # but leaves the run pending for close-matching)
    open_quote = None
    quote_typing = False
    quote_words: List[tuple] = []

    def flush_quote():
        nonlocal quote_words
        if quote_words:
            em.construct(open_quote, quote_words)
            quote_words = []

    def end_quote_typing():
        nonlocal quote_typing
        flush_quote()
        quote_typing = False

    while i < n:
        ch = text[i]
        if ch == "[" and text.startswith("[[", i):
            close = text.find("]]", i + 2)
            if close < 0:
                i += 2
                continue
            lo, hi = i + 2, close
            if text[lo:hi].startswith(":"):
                lo += 1
            end_quote_typing()
            if text.startswith("Category:", lo):
                em.construct(CATEGORY, _words_in(text, lo + 9, hi))
            else:
                em.construct(INTERNAL_LINK, _words_in(text, lo, hi))
            i = close + 2
            continue
        if ch == "[" and _EXTERNAL.match(text, i):
            close = text.find("]", i + 1)
            if close < 0:
                i += 1
                continue
            sp = text.find(" ", i + 1)
            url_end = close if sp < 0 or sp > close else sp
            end_quote_typing()
            em.word(text[i + 1 : url_end], EXTERNAL_LINK_URL, i + 1, url_end)
            disp = _words_in(text, url_end, close)
            em.construct(EXTERNAL_LINK, disp, first_inc=0)
            i = close + 1
            continue
        if ch == "<":
            m = _REF_OPEN.match(text, i)
            if m:
                close = text.find("</ref>", m.end())
                if close >= 0:
                    end_quote_typing()
                    em.construct(CITATION, _words_in(text, m.end(), close))
                    i = close + 6
                    continue
            m = _TAG.match(text, i)
            if m:
                i = m.end()
                continue
            i += 1
            continue
        if ch == "=":
            m = _EQ_RUN.match(text, i)
            run = len(m.group(0))
            if run >= 2:
                closing = text.find("=" * run, m.end())
                nl = text.find("\n", m.end())
                if closing >= 0 and (nl < 0 or closing < nl):
                    end_quote_typing()
                    em.construct(
                        HEADING if run == 2 else SUB_HEADING,
                        _words_in(text, m.end(), closing),
                    )
                    i = closing + run
                    continue
            i = m.end()
            continue
        if ch == "'":
            m = _QUOTES.match(text, i)
            if m and len(m.group(0)) >= 2:
                run = len(m.group(0))
                rtype = BOLD_ITALICS if run >= 5 else (BOLD if run >= 3 else ITALICS)
                if open_quote == rtype:
                    # a run of the SAME type closes the pending quote
                    end_quote_typing()
                    open_quote = None
                else:
                    # opens — or, while a different-type run is still
                    # pending, re-opens with the new type ("closed.
                    # '''same" after an unclosed '' → same is BOLD)
                    end_quote_typing()
                    open_quote = rtype
                    quote_typing = True
                i = m.end()
                continue
            # lone apostrophe: part of a word ("Here's") — fall through
        m = _WORD.match(text, i)
        if m:
            term = m.group(0)
            if quote_typing:
                quote_words.append((term, m.start(), m.end()))
            else:
                em.word(term, _plain_type(term), m.start(), m.end())
            i = m.end()
            continue
        i += 1
    flush_quote()
    return em.out


_WIKI_SCHEMA = (
    "array<struct<term:string,type:string,pos:int,start:int,end:int,flags:int>>"
)


def wikipedia_tokenizer_udf(
    mode: int = TOKENS_ONLY, untokenized_types: Iterable[str] = ()
):
    """Arrow-batched tokenizer column: text → array of typed tokens."""
    from pyspark.sql.functions import pandas_udf

    untok = tuple(untokenized_types)

    @pandas_udf(_WIKI_SCHEMA)
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: [
                (d["term"], d["type"], d["pos"], d["start"], d["end"], d["flags"])
                for d in wikipedia_tokenize(t or "", mode, untok)
            ]
        )

    return _tok


def wiki_plain_text_col(col):
    """Wiki markup → display plain text as a PURE JVM regexp chain
    (whole-stage codegen, no Python, no shuffle) — the corpus-scale
    companion to the tokenizer for text-extraction pipelines.

    Rules (display-text convention): citations and ``[[Category:…]]``
    tags drop entirely; ``[[link|display]]`` keeps the display part,
    ``[[link]]`` the target; ``[http://url display]`` keeps the
    display (bare external links drop); quote runs and heading
    ``=``-fences strip; remaining HTML tags strip; whitespace
    collapses and trims.
    """
    from pyspark.sql import functions as F

    c = col
    c = F.regexp_replace(c, r"<ref[^>/]*>.*?</ref>", " ")
    c = F.regexp_replace(c, r"\[\[:?Category:[^\]]*\]\]", " ")
    c = F.regexp_replace(c, r"\[\[[^\]|]*\|([^\]]*)\]\]", r"$1")
    c = F.regexp_replace(c, r"\[\[:?([^\]]*)\]\]", r"$1")
    c = F.regexp_replace(c, r"\[(?:https?|ftp)://\S*\s+([^\]]*)\]", r"$1")
    c = F.regexp_replace(c, r"\[(?:https?|ftp)://[^\]]*\]", " ")
    c = F.regexp_replace(c, r"'{2,}", "")
    c = F.regexp_replace(c, r"={2,}", " ")
    c = F.regexp_replace(c, r"</?[A-Za-z][^>]*>", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)
