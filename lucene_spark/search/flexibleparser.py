"""Flexible ("modern") query parser — the StandardQueryParser dialect.

Reference: `lucene/queryparser/src/java/org/apache/lucene/queryparser/
flexible/standard/StandardQueryParser.java:92` — the JavaCC
StandardSyntaxParser feeding a config-driven QueryNodeProcessor
pipeline (`StandardQueryConfigHandler.ConfigurationKeys`) and builder
set. The grammar overlaps the classic dialect heavily (the reference
documents it as classic-compatible); what the flexible pipeline adds
is the configuration surface and a few syntax extras. This module
maps that surface onto the same query classes `queryparser.py` builds:

- config handlers → constructor/properties: ``default_operator``
  (AND/OR, `ConfigurationKeys.DEFAULT_OPERATOR`), ``phrase_slop``
  (`PHRASE_SLOP` — applied to phrases WITHOUT an explicit ``~n``),
  ``fuzzy_max_edits`` (`FUZZY_CONFIG`), ``allow_leading_wildcard``
  (`ALLOW_LEADING_WILDCARD`, default False like the reference —
  a leading ``*``/``?`` raises unless enabled).
- syntax extras over the classic module: regexp ``/body/``
  (`RegexpQueryNodeBuilder`), exclusive / mixed range bounds
  ``{a TO b}`` / ``[a TO b}`` (`TermRangeQueryNodeProcessor`).
- default-operator resolution follows
  `GroupQueryNodeProcessor`: with AND default every clause is MUST
  unless an explicit ``OR`` touches it (``a OR b c`` → a:S b:S c:M);
  explicit ``+``/``-``/``NOT`` always win.

Single-field engine like the classic module: ``field:`` prefixes are
accepted and stripped.
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
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_spark.search.queryparser import QueryParseError

__all__ = ["StandardQueryParser"]

_TOKEN = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<and>AND\b|&&) | (?P<or>OR\b|\|\|) | (?P<not>NOT\b|!) |
    (?P<plus>\+) | (?P<minus>-) |
    (?P<phrase>"(?P<phrase_body>[^"]*)"(?:~(?P<slop>\d+))?) |
    (?P<regexp>/(?P<regexp_body>(?:\\.|[^/\\])*)/) |
    (?P<range>[\[{](?P<lo>\S+)\s+TO\s+(?P<hi>\S+)[\]}]) |
    (?P<term>[^\s()+\-!"/\[\]{}][^\s()!"/\[\]{}]*) |
    (?P<ws>\s+)
    """,
    re.VERBOSE,
)
_BOOST = re.compile(r"\^(\d+(?:\.\d+)?)")


class StandardQueryParser:
    """`StandardQueryParser.java:92` analog; see module docstring."""

    def __init__(
        self,
        default_operator: str = "OR",
        phrase_slop: int = 0,
        fuzzy_max_edits: int = 2,
        allow_leading_wildcard: bool = False,
    ):
        op = default_operator.upper()
        if op not in ("AND", "OR"):
            raise ValueError(f"default_operator must be AND or OR, got {op!r}")
        self.default_operator = op
        self.phrase_slop = int(phrase_slop)
        self.fuzzy_max_edits = int(fuzzy_max_edits)
        self.allow_leading_wildcard = bool(allow_leading_wildcard)

    # ---- lexer -------------------------------------------------------
    def _lex(self, s: str) -> List[Tuple[str, object]]:
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
                out.append(
                    (
                        "phrase",
                        (
                            m.group("phrase_body"),
                            int(m.group("slop")) if m.group("slop") else None,
                        ),
                    )
                )
            elif kind == "regexp":
                out.append(("regexp", m.group("regexp_body").replace("\\/", "/")))
            elif kind == "range":
                raw = m.group(0)
                out.append(
                    (
                        "range",
                        (m.group("lo"), m.group("hi"), raw[0] == "[", raw[-1] == "]"),
                    )
                )
            elif kind == "term":
                out.append(("term", m.group("term")))
            else:
                out.append((kind, m.group(0)))
            # trailing ^boost binds to the token just emitted
            if out and out[-1][0] in ("phrase", "regexp", "range"):
                bm = _BOOST.match(s, pos)
                if bm:
                    out.append(("boost", float(bm.group(1))))
                    pos = bm.end()
        return out

    # ---- atoms -------------------------------------------------------
    def _term_like(self, raw: str) -> Optional[Query]:
        if ":" in raw:
            raw = raw.split(":", 1)[1]
            if not raw:
                return None
        boost = None
        bm = _BOOST.search(raw)
        if bm and bm.end() == len(raw):
            boost = float(bm.group(1))
            raw = raw[: bm.start()]
        fuzzy = None
        fm = re.search(r"~(\d*)$", raw)
        if fm and "*" not in raw and "?" not in raw:
            fuzzy = int(fm.group(1)) if fm.group(1) else self.fuzzy_max_edits
            raw = raw[: fm.start()]
        if not raw:
            return None
        q: Optional[Query]
        if "*" in raw or "?" in raw:
            if raw[0] in "*?" and not self.allow_leading_wildcard:
                # AllowLeadingWildcardProcessor: disabled by default
                raise QueryParseError(
                    f"leading wildcard in {raw!r}: set allow_leading_wildcard"
                )
            lowered = raw.lower()
            if re.fullmatch(r"[^*?]+\*", lowered):
                q = PrefixQuery(lowered[:-1])
            else:
                q = WildcardQuery(lowered)
        elif fuzzy is not None:
            toks = analyze(raw)
            q = FuzzyQuery(toks[0][0], fuzzy) if toks else None
        else:
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

    # ---- recursive-descent over one group ----------------------------
    def _parse_group(self, toks, i: int) -> Tuple[Query, int]:
        # each entry: (explicit_occur or None, conj_before: 'and'|'or'|None, query)
        entries: List[list] = []
        pending_conj: Optional[str] = None
        while i < len(toks):
            kind, val = toks[i]
            if kind == "rparen":
                break
            if kind in ("and", "or"):
                pending_conj = kind
                i += 1
                continue
            explicit: Optional[Occur] = None
            if kind == "plus":
                explicit = Occur.MUST
                i += 1
                kind, val = toks[i] if i < len(toks) else ("eof", None)
            elif kind in ("minus", "not"):
                explicit = Occur.MUST_NOT
                i += 1
                kind, val = toks[i] if i < len(toks) else ("eof", None)
            q, i = self._parse_atom(toks, i)
            if q is not None:
                entries.append([explicit, pending_conj, q])
            pending_conj = None
        # GroupQueryNodeProcessor occur resolution
        clauses: List[BooleanClause] = []
        for j, (explicit, conj, q) in enumerate(entries):
            if explicit is not None:
                occur = explicit
            elif conj == "or":
                occur = Occur.SHOULD
            elif conj == "and":
                occur = Occur.MUST
            elif self.default_operator == "AND":
                # first clause: SHOULD only if the NEXT conj is OR
                nxt = entries[j + 1][1] if j == 0 and len(entries) > 1 else None
                occur = Occur.SHOULD if nxt == "or" else Occur.MUST
            else:
                occur = Occur.SHOULD
            if conj == "and" and clauses and clauses[-1].occur == Occur.SHOULD:
                # AND promotes its left operand too (classic addClause)
                if entries[j - 1][0] is None:
                    clauses[-1] = BooleanClause(clauses[-1].query, Occur.MUST)
            if conj == "or" and clauses and clauses[-1].occur == Occur.MUST:
                # OR demotes an implicitly-MUST left operand (AND default)
                if entries[j - 1][0] is None and entries[j - 1][1] is None:
                    clauses[-1] = BooleanClause(clauses[-1].query, Occur.SHOULD)
            clauses.append(BooleanClause(q, occur))
        if not clauses:
            return MatchNoDocsQuery("empty query"), i
        if len(clauses) == 1 and clauses[0].occur == Occur.SHOULD:
            return clauses[0].query, i
        return BooleanQuery.of(*clauses), i

    def _parse_atom(self, toks, i: int) -> Tuple[Optional[Query], int]:
        kind, val = toks[i]
        i += 1
        if kind == "lparen":
            q, i = self._parse_group(toks, i)
            if i >= len(toks) or toks[i][0] != "rparen":
                raise QueryParseError("unbalanced parenthesis")
            i += 1
            if (
                i < len(toks)
                and toks[i][0] == "term"
                and re.fullmatch(r"\^\d+(\.\d+)?", str(toks[i][1]))
            ):
                q = BoostQuery(q, float(str(toks[i][1])[1:]))
                i += 1
            return q, i
        if kind == "phrase":
            body, slop = val
            terms = [t for t, _ in analyze(body)]
            if not terms:
                return None, i
            if slop is None:
                slop = self.phrase_slop  # PHRASE_SLOP config default
            q: Query = (
                TermQuery(terms[0])
                if len(terms) == 1
                else PhraseQuery(tuple(terms), slop)
            )
            if i < len(toks) and toks[i][0] == "boost":
                q = BoostQuery(q, float(toks[i][1]))
                i += 1
            return q, i
        if kind == "regexp":
            q = RegexpQuery(str(val))
            if i < len(toks) and toks[i][0] == "boost":
                q = BoostQuery(q, float(toks[i][1]))
                i += 1
            return q, i
        if kind == "range":
            lo, hi, inc_lo, inc_hi = val
            lo = None if lo == "*" else lo.lower()
            hi = None if hi == "*" else hi.lower()
            q = TermRangeQuery(lo, hi, include_lower=inc_lo, include_upper=inc_hi)
            if i < len(toks) and toks[i][0] == "boost":
                q = BoostQuery(q, float(toks[i][1]))
                i += 1
            return q, i
        if kind == "term":
            return self._term_like(str(val)), i
        raise QueryParseError(f"unexpected token {kind}")

    def parse(self, s: str) -> Query:
        toks = self._lex(s)
        q, i = self._parse_group(toks, 0)
        if i != len(toks):
            raise QueryParseError(f"unbalanced parenthesis at token {i}")
        return q
