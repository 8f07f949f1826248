"""Classic query parser: Lucene QueryParser syntax → query tree.

Re-implements the useful core of
`lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/`
(grammar in `QueryParser.jj`, semantics in `QueryParserBase.java:133-137`
and `QueryBuilder`): enough to run the reference benchmark query sets
(`lucene/benchmark/conf/query-terms.txt` — e.g. ``Abraham AND Lincoln``,
`query-phrases.txt`, `query-wildcards.txt`).

Supported syntax:

- bare terms (analyzed): ``spark query``  → SHOULD clauses
- ``AND`` / ``OR`` / ``NOT`` (and ``&&`` / ``||`` / ``!``)
- ``+term`` (MUST) / ``-term`` (MUST_NOT)
- ``"a phrase"`` (PhraseQuery), ``"a phrase"~2`` (slop)
- ``wild*card``, ``wild?card`` (WildcardQuery), ``prefix*`` (PrefixQuery)
- ``fuzzy~`` / ``fuzzy~1`` (FuzzyQuery)
- ``[a TO b]`` (TermRangeQuery, inclusive)
- ``term^2.5`` boost, ``(grouped queries)^boost``
- ``field:...`` accepted and ignored (single-field engine), matching
  how the demo uses one default field.

Default operator is OR (SHOULD) like ``QueryParserBase`` defaults;
``AND`` promotes both operands to MUST within the current group —
mirroring the classic parser's `addClause` conjunction handling.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from lucene_spark.analysis import analyze
from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

__all__ = ["parse_query", "QueryParseError"]


class QueryParseError(ValueError):
    pass


_TOKEN = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<and>AND\b|&&) | (?P<or>OR\b|\|\|) | (?P<not>NOT\b|!) |
    (?P<plus>\+) | (?P<minus>-) |
    (?P<phrase>"(?P<phrase_body>[^"]*)"(?:~(?P<slop>\d+))?) |
    (?P<range>\[(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\]) |
    (?P<term>[^\s()+\-!"\[\]][^\s()!"\[\]]*) |
    (?P<ws>\s+)
    """,
    re.VERBOSE,
)
# term grammar mirrors QueryParser.jj:186: '+'/'-' are NOT in
# _TERM_START_CHAR (so they lex as operators at clause start) but ARE
# in _TERM_CHAR — "hash-join" is ONE term token, not hash AND NOT join

_BOOST = re.compile(r"\^(\d+(?:\.\d+)?)$")


def _lex(s: str) -> List[Tuple[str, object]]:
    out: List[Tuple[str, object]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise QueryParseError(f"cannot lex at {pos}: {s[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        if kind == "phrase":
            out.append(("phrase", (m.group("phrase_body"), int(m.group("slop") or 0))))
            # trailing boost on the closing quote
            bm = _BOOST.match(s, pos)
            if bm:
                out.append(("boost", float(bm.group(1))))
                pos = bm.end()
        elif kind == "range":
            out.append(("range", (m.group("lo"), m.group("hi"))))
        elif kind == "term":
            out.append(("term", m.group("term")))
        else:
            out.append((kind, m.group(0)))
    return out


def _analyze_one(text: str) -> Optional[str]:
    toks = analyze(text)
    return toks[0][0] if toks else None


def _term_like(raw: str) -> Optional[Query]:
    """A bare term token → Term/Prefix/Wildcard/Fuzzy/Boost query."""
    # field: prefix — single-field engine, strip it
    if ":" in raw:
        raw = raw.split(":", 1)[1]
        if not raw:
            return None
    boost = None
    bm = _BOOST.search(raw)
    if bm:
        boost = float(bm.group(1))
        raw = raw[: bm.start()]
    fuzzy = None
    fm = re.search(r"~(\d*)$", raw)
    if fm and "*" not in raw and "?" not in raw:
        fuzzy = int(fm.group(1) or 2)
        raw = raw[: fm.start()]
    if not raw:
        return None
    q: Optional[Query]
    if "*" in raw or "?" in raw:
        lowered = raw.lower()
        if re.fullmatch(r"[^*?]+\*", lowered):
            q = PrefixQuery(lowered[:-1])
        else:
            q = WildcardQuery(lowered)
    elif fuzzy is not None:
        t = _analyze_one(raw)
        q = FuzzyQuery(t, fuzzy) if t else None
    else:
        # one query term can analyze to several tokens (e.g.
        # "hash-join" → hash, join): classic default builds a SHOULD
        # group, NOT a phrase (QueryBuilder.createFieldQuery with
        # autoGeneratePhraseQueries=false, the default since 3.1)
        toks = [t for t, _ in analyze(raw)]
        if not toks:
            q = None
        elif len(toks) == 1:
            q = TermQuery(toks[0])
        else:
            q = BooleanQuery.of(
                *[BooleanClause(TermQuery(t), Occur.SHOULD) for t in toks]
            )
    if q is not None and boost is not None:
        q = BoostQuery(q, boost)
    return q


class _Parser:
    def __init__(self, tokens: List[Tuple[str, object]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> Optional[Tuple[str, object]]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tuple[str, object]:
        t = self.toks[self.i]
        self.i += 1
        return t

    # grammar: query := clause ( (AND|OR)? clause )*
    def parse(self) -> Query:
        clauses: List[BooleanClause] = []
        pending_conj: Optional[str] = None
        while True:
            t = self.peek()
            if t is None or t[0] == "rparen":
                break
            if t[0] in ("and", "or"):
                pending_conj = t[0]
                self.next()
                continue
            occur = Occur.SHOULD
            if t[0] == "plus":
                self.next()
                occur = Occur.MUST
            elif t[0] in ("minus", "not"):
                self.next()
                occur = Occur.MUST_NOT
            sub = self.parse_atom()
            if sub is None:
                continue
            if pending_conj == "and" and occur == Occur.SHOULD:
                # AND promotes both operands to MUST (classic addClause)
                if clauses and clauses[-1].occur == Occur.SHOULD:
                    clauses[-1] = BooleanClause(clauses[-1].query, Occur.MUST)
                occur = Occur.MUST
            clauses.append(BooleanClause(sub, occur))
            pending_conj = None
        if not clauses:
            return MatchNoDocsQuery("empty query")
        if len(clauses) == 1 and clauses[0].occur == Occur.SHOULD:
            return clauses[0].query
        return BooleanQuery.of(*clauses)

    def parse_atom(self) -> Optional[Query]:
        kind, val = self.next()
        if kind == "lparen":
            q = self.parse()
            t = self.peek()
            if t is None or t[0] != "rparen":
                raise QueryParseError("unbalanced parenthesis")
            self.next()
            t = self.peek()
            if t is not None and t[0] == "term" and re.fullmatch(r"\^\d+(\.\d+)?", str(t[1])):
                self.next()
                return BoostQuery(q, float(str(t[1])[1:]))
            return q
        if kind == "phrase":
            body, slop = val
            terms = [t for t, _ in analyze(body)]
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(terms[0])
            q: Query = PhraseQuery(tuple(terms), slop)
            t = self.peek()
            if t is not None and t[0] == "boost":
                self.next()
                q = BoostQuery(q, float(t[1]))
            return q
        if kind == "range":
            lo, hi = val
            return TermRangeQuery(lo.lower(), hi.lower())
        if kind == "term":
            return _term_like(str(val))
        raise QueryParseError(f"unexpected token {kind}")


def parse_query(s: str) -> Query:
    """Parse a classic-syntax query string into a query tree."""
    return _Parser(_lex(s)).parse()
