"""SimpleQueryParser: lenient human-friendly syntax → query tree.

Re-implements `queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java` for the single-field engine: a parser
that NEVER throws — any syntax error is decoded as best it can
(unbalanced parens/quotes become extraneous characters, bad fuzziness
digits are swallowed), exactly like the reference state machine.

Syntax (each operator individually switchable via `flags`):

- ``+`` AND, ``|`` OR, ``-`` NOT (doubled ``--`` negates the negation)
- ``"a phrase"`` and ``"a phrase"~N`` (NEAR slop)
- ``term*`` prefix, ``term~N`` fuzzy (``~0`` → plain term)
- ``( )`` precedence groups, ``\\`` escapes, whitespace separates
- ``*`` alone → MatchAllDocsQuery
- right-to-left precedence: an operation CHANGE wraps the current tree
  as one clause of a fresh BooleanQuery (`buildQueryTree`), so
  ``a | b + c`` evaluates ``(a OR b) AND c``
- negation wraps as ``(+*:* -token)``: BooleanQuery(MatchAll SHOULD,
  token MUST_NOT) — `SimpleQueryParser.java:456-463`
"""

from __future__ import annotations

from typing import List, Optional

from lucene_spark.analysis import analyze
from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

__all__ = [
    "simple_parse",
    "AND_OPERATOR",
    "NOT_OPERATOR",
    "OR_OPERATOR",
    "PREFIX_OPERATOR",
    "PHRASE_OPERATOR",
    "PRECEDENCE_OPERATORS",
    "ESCAPE_OPERATOR",
    "WHITESPACE_OPERATOR",
    "FUZZY_OPERATOR",
    "NEAR_OPERATOR",
]

AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9

_WS = " \t\n\r"
_MAX_FUZZINESS = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


class _State:
    __slots__ = ("data", "index", "length", "top", "not_", "current", "previous")

    def __init__(self, data: str, start: int, length: int):
        self.data = data
        self.index = start
        self.length = length
        self.top: Optional[Query] = None
        self.not_ = 0
        self.current: Optional[Occur] = None
        self.previous: Optional[Occur] = None


class _Simple:
    def __init__(self, flags: int, default_operator: Occur):
        self.flags = flags
        self.default_operator = default_operator

    # -- factory methods (newDefaultQuery / newPhraseQuery / ...) ------
    def _default_query(self, text: str) -> Optional[Query]:
        toks = [t for t, _ in analyze(text)]
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0])
        return BooleanQuery.of(
            *[BooleanClause(TermQuery(t), self.default_operator) for t in toks]
        )

    def _phrase_query(self, text: str, slop: int) -> Optional[Query]:
        toks = [t for t, _ in analyze(text)]
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0])
        return PhraseQuery(tuple(toks), slop)

    def _prefix_query(self, text: str) -> Optional[Query]:
        from lucene_spark.analysis import simple_lowercase

        text = simple_lowercase(text)
        return PrefixQuery(text) if text else None

    def _fuzzy_query(self, text: str, fuzziness: int) -> Optional[Query]:
        from lucene_spark.analysis import simple_lowercase

        text = simple_lowercase(text)
        return FuzzyQuery(text, fuzziness) if text else None

    # -- the state machine (parseSubQuery) -----------------------------
    def parse_sub(self, st: _State) -> None:
        f = self.flags
        while st.index < st.length:
            ch = st.data[st.index]
            if ch == "(" and f & PRECEDENCE_OPERATORS:
                self._consume_subquery(st)
            elif ch == ")" and f & PRECEDENCE_OPERATORS:
                st.index += 1  # extraneous
            elif ch == '"' and f & PHRASE_OPERATOR:
                self._consume_phrase(st)
            elif ch == "+" and f & AND_OPERATOR:
                if st.current is None and st.top is not None:
                    st.current = Occur.MUST
                st.index += 1
            elif ch == "|" and f & OR_OPERATOR:
                if st.current is None and st.top is not None:
                    st.current = Occur.SHOULD
                st.index += 1
            elif ch == "-" and f & NOT_OPERATOR:
                st.not_ += 1
                st.index += 1
                continue  # keep the not count for the next char
            elif ch in _WS and f & WHITESPACE_OPERATOR:
                st.index += 1
            else:
                self._consume_token(st)
            st.not_ = 0

    def _consume_subquery(self, st: _State) -> None:
        start = st.index = st.index + 1
        depth, escaped = 1, False
        while st.index < st.length:
            if not escaped:
                ch = st.data[st.index]
                if ch == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    st.index += 1
                    continue
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
            escaped = False
            st.index += 1
        if st.index == st.length:
            st.index = start  # no closing paren: '(' is extraneous
        elif st.index == start:
            st.current = None  # "()" resets the pending operation
            st.index += 1
        else:
            sub = _State(st.data, start, st.index)
            self.parse_sub(sub)
            self._build(st, sub.top)
            st.index += 1

    def _consume_phrase(self, st: _State) -> None:
        start = st.index = st.index + 1
        buf: List[str] = []
        escaped = False
        has_slop = False
        while st.index < st.length:
            if not escaped:
                ch = st.data[st.index]
                if ch == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    st.index += 1
                    continue
                if ch == '"':
                    if (
                        st.length > st.index + 1
                        and st.data[st.index + 1] == "~"
                        and self.flags & NEAR_OPERATOR
                    ):
                        st.index += 1
                        if st.length > st.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(st.data[st.index])
            st.index += 1
        if st.index == st.length:
            st.index = start  # unterminated quote is extraneous
        elif not buf:
            st.current = None
            st.index += 1
        else:
            slop = self._parse_fuzziness(st) if has_slop else 0
            self._build(st, self._phrase_query("".join(buf), slop))
            st.index += 1

    def _consume_token(self, st: _State) -> None:
        buf: List[str] = []
        escaped = prefix = fuzzy = False
        while st.index < st.length:
            if not escaped:
                ch = st.data[st.index]
                if ch == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    st.index += 1
                    continue
                if self._token_finished(st):
                    break
                if buf and ch == "~" and self.flags & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = bool(buf) and ch == "*" and self.flags & PREFIX_OPERATOR
            escaped = False
            buf.append(st.data[st.index])
            st.index += 1
        if not buf:
            return
        if fuzzy:
            token = "".join(buf)
            fz = min(self._parse_fuzziness(st), _MAX_FUZZINESS)
            branch = (
                self._default_query(token)
                if fz == 0
                else self._fuzzy_query(token, fz)
            )
        elif prefix:
            branch = self._prefix_query("".join(buf[:-1]))
        else:
            branch = self._default_query("".join(buf))
        self._build(st, branch)

    def _token_finished(self, st: _State) -> bool:
        ch = st.data[st.index]
        f = self.flags
        return bool(
            (ch == '"' and f & PHRASE_OPERATOR)
            or (ch == "|" and f & OR_OPERATOR)
            or (ch == "+" and f & AND_OPERATOR)
            or (ch == "(" and f & PRECEDENCE_OPERATORS)
            or (ch == ")" and f & PRECEDENCE_OPERATORS)
            or (ch in _WS and f & WHITESPACE_OPERATOR)
        )

    def _parse_fuzziness(self, st: _State) -> int:
        if st.index >= st.length or st.data[st.index] != "~":
            return 0
        digits: List[str] = []
        while st.index < st.length:
            st.index += 1
            if st.index < st.length:
                if self._token_finished(st):
                    break
                digits.append(st.data[st.index])
        text = "".join(digits)
        if not text:
            return 2  # bare ~ → automatic fuzziness
        try:
            return max(int(text), 0)
        except ValueError:
            return 0  # swallowed, like the reference

    # -- buildQueryTree -------------------------------------------------
    def _build(self, st: _State, branch: Optional[Query]) -> None:
        if branch is None:
            return
        if st.not_ % 2 == 1:
            branch = BooleanQuery.of(
                BooleanClause(branch, Occur.MUST_NOT),
                BooleanClause(MatchAllDocsQuery(), Occur.SHOULD),
            )
        if st.top is None:
            st.top = branch
        else:
            if st.current is None:
                st.current = self.default_operator
            if st.previous != st.current:
                st.top = BooleanQuery.of(BooleanClause(st.top, st.current))
            assert isinstance(st.top, BooleanQuery)
            st.top = BooleanQuery(
                st.top.clauses + (BooleanClause(branch, st.current),),
                st.top.minimum_number_should_match,
            )
            st.previous = st.current
        st.current = None


def simple_parse(
    text: str,
    default_operator: Occur = Occur.SHOULD,
    flags: int = -1,
) -> Query:
    """Parse `text` with SimpleQueryParser semantics. Never raises."""
    if text.strip() == "*":
        return MatchAllDocsQuery()
    st = _State(text, 0, len(text))
    _Simple(flags, default_operator).parse_sub(st)
    if st.top is None:
        return MatchNoDocsQuery("empty string passed to query parser")
    return st.top
