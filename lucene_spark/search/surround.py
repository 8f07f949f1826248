"""Surround query language → query tree (proximity-first dialect).

Re-expresses the core of `queryparser/src/java/org/apache/lucene/
queryparser/surround/` for the single-field engine:

- infix ``a AND b``, ``a OR b``, ``a NOT b`` (case-insensitive), with
  the reference grammar's precedence chain OR < AND < NOT < N < W
  (`parser/QueryParser.jj:256-350`);
- distance operators ``W`` (ordered) and ``N`` (unordered) in both
  infix (``a 3W b``) and prefix (``3W(a, b)``) form; distance defaults
  to 1 (adjacent) and may be 2-99. ``nW/nN`` maps to a SpanNearQuery
  with ``slop = distance - 1`` (`query/DistanceQuery.java:96`);
- prefix boolean forms ``AND(a, b, ...)`` / ``OR(a, b, ...)``;
- truncation: trailing ``*`` → PrefixQuery, embedded ``*``/``?`` →
  WildcardQuery (TRUNCATOR / ANY_CHAR, `QueryParser.jj:84-86`);
- parenthesised grouping.

Unlike SimpleQueryParser, surround REJECTS malformed input
(ParseException semantics → :class:`QueryParseError`), and distance
operands must be term-like (the reference builds span clauses from
them; OR-within-distance → SpanOr is out of scope, documented).
Surround does not analyze terms (`query/SrndTermQuery.java` matches
the raw term text); we lowercase to match the engine's normalized
dictionary, as the reference's users do with a lowercasing tokenizer.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from lucene_spark.analysis import simple_lowercase
from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    Occur,
    PrefixQuery,
    Query,
    SpanNearQuery,
    TermQuery,
    WildcardQuery,
)
from lucene_spark.search.queryparser import QueryParseError

__all__ = ["surround_parse"]

_TOKEN = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) | (?P<comma>,) |
    (?P<distop>(?P<dist>\d{1,2})?(?P<wn>[WwNn])\b(?=\s*\()) |
    (?P<word>[^\s(),]+) |
    (?P<ws>\s+)
    """,
    re.VERBOSE,
)


def _lex(s: str) -> List[Tuple[str, str]]:
    out: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise QueryParseError(f"surround: cannot lex at {pos}: {s[pos:pos+10]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group(0)))
    return out


def _infix_op(tok: Tuple[str, str]) -> Optional[Tuple[str, int]]:
    """(op, distance) when `tok` is an infix operator word."""
    if tok[0] == "distop":
        m = re.fullmatch(r"(\d{1,2})?([WwNn])", tok[1])
        return tok[1][-1].upper(), int(m.group(1) or 1)
    if tok[0] != "word":
        return None
    up = tok[1].upper()
    if up in ("AND", "OR", "NOT"):
        return up, 0
    m = re.fullmatch(r"(\d{1,2})?([WN])", up)
    if m:
        return m.group(2), int(m.group(1) or 1)
    return None


class _Parser:
    def __init__(self, toks: List[Tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Optional[Tuple[str, str]]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tuple[str, str]:
        if self.i >= len(self.toks):
            raise QueryParseError("surround: unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    # precedence chain: OR < AND < NOT < N < W (QueryParser.jj)
    def parse(self) -> Query:
        q = self._level("OR")
        if self.peek() is not None:
            raise QueryParseError(f"surround: trailing input {self.peek()!r}")
        return q

    _NEXT = {"OR": "AND", "AND": "NOT", "NOT": "N", "N": "W"}

    def _level(self, op: str) -> Query:
        sub = (
            self._primary if op == "W" else lambda: self._level(self._NEXT[op])
        )
        # the reference grammar collects ONE flat operand list per
        # level (last distance token wins), so `a 3W b 3W c` is a
        # single 3-term DistanceQuery, not a nested pair
        items = [sub()]
        dist = 1
        while True:
            t = self.peek()
            info = _infix_op(t) if t is not None else None
            if info is None or info[0] != op:
                break
            self.next()
            dist = info[1]
            items.append(sub())
        if len(items) == 1:
            return items[0]
        return _combine(op, items, dist)

    def _primary(self) -> Query:
        kind, val = self.next()
        if kind == "lparen":
            q = self._level("OR")
            t = self.next()
            if t[0] != "rparen":
                raise QueryParseError("surround: expected ')'")
            return q
        if kind == "distop" or (
            kind == "word" and self.peek() is not None and self.peek()[0] == "lparen"
            and _infix_op((kind, val)) is not None
        ):
            info = _infix_op((kind, val))
            assert info is not None
            if info[0] == "NOT":  # reference: NOT is infix-only
                raise QueryParseError("surround: NOT has no prefix form")
            return self._prefix_list(*info)
        if kind == "word":
            return _term_like(val)
        raise QueryParseError(f"surround: unexpected token {val!r}")

    def _prefix_list(self, op: str, dist: int) -> Query:
        t = self.next()
        if t[0] != "lparen":
            raise QueryParseError(f"surround: {op} prefix form needs '('")
        items: List[Query] = [self._level("OR")]
        while True:
            t = self.next()
            if t[0] == "rparen":
                break
            if t[0] != "comma":
                raise QueryParseError("surround: expected ',' or ')'")
            items.append(self._level("OR"))
        return _combine(op, items, dist)


def _term_like(raw: str) -> Query:
    text = simple_lowercase(raw)
    if ":" in text:  # field operator — single-field engine, strip
        text = text.split(":", 1)[1]
    if not text:
        raise QueryParseError("surround: empty term")
    if "?" in text or "*" in text[:-1]:
        return WildcardQuery(text)
    if text.endswith("*"):
        if len(text) - 1 < 3:  # MINIMUM_PREFIX_LENGTH
            raise QueryParseError(f"Too unrestrictive truncation: {raw}")
        return PrefixQuery(text[:-1])
    return TermQuery(text)


def _combine(op: str, items: List[Query], dist: int) -> Query:
    if op == "OR":
        return _flat_bool(items, Occur.SHOULD)
    if op == "AND":
        return _flat_bool(items, Occur.MUST)
    if op == "NOT":
        first, rest = items[0], items[1:]
        return BooleanQuery.of(
            BooleanClause(first, Occur.MUST),
            *[BooleanClause(r, Occur.MUST_NOT) for r in rest],
        )
    # W / N distance op → SpanNearQuery(slop = dist - 1)
    terms = []
    for it in items:
        if isinstance(it, TermQuery):
            terms.append(it.term)
        else:
            raise QueryParseError(
                "surround: distance operands must be terms "
                f"(got {type(it).__name__}); nested spans / "
                "OR-within-distance are unsupported"
            )
    if len(terms) < 2:
        raise QueryParseError("surround: distance op needs >= 2 operands")
    return SpanNearQuery(tuple(terms), slop=dist - 1, in_order=(op == "W"))


def _flat_bool(items: List[Query], occur: Occur) -> Query:
    clauses: List[BooleanClause] = []
    for it in items:
        if isinstance(it, BooleanQuery) and all(
            c.occur == occur for c in it.clauses
        ):
            clauses.extend(it.clauses)
        else:
            clauses.append(BooleanClause(it, occur))
    return BooleanQuery.of(*clauses)


def surround_parse(s: str) -> Query:
    """Parse a surround-syntax query string into a query tree."""
    toks = _lex(s)
    if not toks:
        raise QueryParseError("surround: empty query")
    return _Parser(toks).parse()
