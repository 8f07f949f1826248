"""Query.toString parity: render a query tree in Lucene's exact
diagnostic syntax.

Reference parity targets (each branch cites the Java it mirrors):
  - core/search/TermQuery.java ``toString(field)`` — bare term, field
    prefix only when it differs from the passed default field
  - BooleanClause.Occur symbols MUST "+", FILTER "#", SHOULD "",
    MUST_NOT "-" (core/search/BooleanClause.java:31-65)
  - BooleanQuery.java ``toString`` — sub-booleans wrapped in parens,
    whole query wrapped + "~n" when minimumNumberShouldMatch > 0
  - DisjunctionMaxQuery.java — "(a | b)~tie" with tie omitted at 0
  - BoostQuery.java — "(sub)^boost"; ConstantScoreQuery.java —
    "ConstantScore(sub)"
  - PrefixQuery "pre*", WildcardQuery raw pattern, FuzzyQuery
    "term~maxEdits", RegexpQuery "/re/", TermRangeQuery
    "[a TO b]"/"{a TO b}" with "*" for open ends, TermInSetQuery
    "field:(a b c)" (field always printed), PhraseQuery
    "\"a b c\"~slop", MatchAllDocsQuery "*:*", MatchNoDocsQuery
    'MatchNoDocsQuery("reason")'

Floats print Java-style (``2.0`` not ``2``).  The repo's queries are
single-field ("text"), so ``query_to_string(q)`` renders the way
Lucene renders with the matching default field, and
``query_to_string(q, field="")`` forces the "text:" prefixes.
"""

from __future__ import annotations

from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiTermFilterDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

__all__ = ["query_to_string"]

INDEX_FIELD = "text"  # the single indexed field of this engine

_OCCUR = {Occur.MUST: "+", Occur.FILTER: "#", Occur.SHOULD: "", Occur.MUST_NOT: "-"}


def _jfloat(x: float) -> str:
    """Java Float.toString for the values these queries carry."""
    f = float(x)
    return str(int(f)) + ".0" if f == int(f) else repr(f)


def _prefix(field: str) -> str:
    return "" if field == INDEX_FIELD else INDEX_FIELD + ":"


def query_to_string(q: Query, field: str = INDEX_FIELD) -> str:
    p = _prefix(field)
    if isinstance(q, TermQuery):
        return p + q.term
    if isinstance(q, MatchAllDocsQuery):
        return "*:*"
    if isinstance(q, MatchNoDocsQuery):
        return f'MatchNoDocsQuery("{q.reason}")'
    if isinstance(q, ConstantScoreQuery):
        return "ConstantScore(" + query_to_string(q.query, field) + ")"
    if isinstance(q, BoostQuery):
        return "(" + query_to_string(q.query, field) + ")^" + _jfloat(q.boost)
    if isinstance(q, DisjunctionMaxQuery):
        parts = [
            "(" + query_to_string(s, field) + ")"
            if isinstance(s, BooleanQuery)
            else query_to_string(s, field)
            for s in q.queries
        ]
        tie = "~" + _jfloat(q.tie_breaker) if q.tie_breaker != 0.0 else ""
        return "(" + " | ".join(parts) + ")" + tie
    if isinstance(q, BooleanQuery):
        need_parens = q.minimum_number_should_match > 0
        parts = []
        for c in q.clauses:
            sub = query_to_string(c.query, field)
            if isinstance(c.query, BooleanQuery):
                sub = "(" + sub + ")"
            parts.append(_OCCUR[c.occur] + sub)
        body = " ".join(parts)
        if need_parens:
            return "(" + body + ")~" + str(q.minimum_number_should_match)
        return body
    if isinstance(q, PrefixQuery):
        return p + q.prefix + "*"
    if isinstance(q, WildcardQuery):
        return p + q.pattern
    if isinstance(q, RegexpQuery):
        return p + "/" + q.regexp + "/"
    if isinstance(q, FuzzyQuery):
        return p + q.term + "~" + str(q.max_edits)
    if isinstance(q, TermRangeQuery):
        lo = "\\*" if q.lower == "*" else (q.lower if q.lower is not None else "*")
        hi = "\\*" if q.upper == "*" else (q.upper if q.upper is not None else "*")
        return (
            p
            + ("[" if q.include_lower else "{")
            + lo
            + " TO "
            + hi
            + ("]" if q.include_upper else "}")
        )
    if isinstance(q, TermInSetQuery):
        # TermInSetQuery.toString always prints the field (java quirk)
        return INDEX_FIELD + ":(" + " ".join(q.terms) + ")"
    if isinstance(q, PhraseQuery):
        body = p + '"' + " ".join(q.terms) + '"'
        return body + ("~" + str(q.slop) if q.slop else "")
    if isinstance(q, MultiTermFilterDocsQuery):
        return "ConstantScore(" + query_to_string(q.source, field) + ")"
    return repr(q)
