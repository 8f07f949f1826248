"""XML query parser (CoreParser dialect).

Re-expression of the reference's XML query syntax
(`queryparser/src/java/org/apache/lucene/queryparser/xml/CoreParser.java`
and its `builders/`): queries arrive as an XML tree whose element names
name query types and whose attributes carry the knobs. Supported
element subset (the builders wired at `CoreParser.java:90-122` minus
the ones whose underlying query this engine does not model):

========================  =================================================
element                   maps to
========================  =================================================
``TermQuery``             TermQuery(text); ``boost``
``TermsQuery``            whitespace-split text → SHOULD TermQuery clauses
                          (the builder analyzes into a disjunction)
``MatchAllDocsQuery``     MatchAllDocsQuery
``BooleanQuery``          ``Clause`` children with ``occurs`` ∈
                          {should, must, mustNot, filter};
                          ``minimumNumberShouldMatch``; ``boost``
``DisjunctionMaxQuery``   children queries; ``tieBreaker``
``ConstantScoreQuery``    wraps its single child query
``RangeQuery``            TermRangeQuery(lowerTerm, upperTerm,
                          includeLower, includeUpper)
``SpanTerm``              single-term SpanNear operand
``SpanOr`` / ``SpanNear`` SpanNearQuery over SpanTerm leaves; ``slop``
                          (SpanNear's required attribute),
                          ``inOrder`` (default false, as the builder's)
``SpanNot``               Include SpanNear minus Exclude span terms;
                          ``pre``/``post`` widen the exclusion window
``UserQuery``             classic QueryParser passthrough
                          (`UserInputQueryBuilder`)
========================  =================================================

Unknown elements raise ``ValueError`` (ParserException semantics).
``fieldName`` attributes are accepted and ignored — this engine indexes
the single ``text`` field (SURVEY §1.5's fixed-schema mapping).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Occur,
    Query,
    SpanNearQuery,
    SpanNotQuery,
    TermQuery,
    TermRangeQuery,
)

__all__ = ["xml_parse"]

_OCCURS = {
    "should": Occur.SHOULD,
    "must": Occur.MUST,
    "mustnot": Occur.MUST_NOT,
    "filter": Occur.FILTER,
}


def _boost(e: ET.Element, q: Query) -> Query:
    b = float(e.get("boost", "1.0"))
    return BoostQuery(q, b) if b != 1.0 else q


def _span_slot(e: ET.Element):
    """One span child element → a SpanNear slot: a single term string
    (SpanTerm) or a tuple of alternative terms (SpanOr/SpanOrTerms).
    A SpanOr is ONE slot of alternatives — flattening it into separate
    clauses would turn alternation into conjunction."""
    tag = e.tag
    if tag == "SpanTerm":
        return (e.text or "").strip()
    if tag == "SpanOr":
        alts = []
        for c in e:
            s = _span_slot(c)
            if isinstance(s, tuple):
                alts.extend(s)
            else:
                alts.append(s)
        if not alts:
            raise ValueError("empty <SpanOr>")
        return tuple(alts)
    if tag == "SpanOrTerms":
        toks = (e.text or "").split()
        if not toks:
            raise ValueError("empty <SpanOrTerms>")
        return tuple(toks)
    raise ValueError(f"unsupported span element <{tag}>")


def _build(e: ET.Element) -> Query:
    tag = e.tag
    if tag == "TermQuery":
        return _boost(e, TermQuery((e.text or "").strip()))
    if tag == "TermsQuery":
        toks = (e.text or "").split()
        return _boost(
            e,
            BooleanQuery(
                tuple(BooleanClause(TermQuery(t), Occur.SHOULD) for t in toks)
            ),
        )
    if tag == "MatchAllDocsQuery":
        return MatchAllDocsQuery()
    if tag == "BooleanQuery":
        clauses = []
        for c in e:
            if c.tag != "Clause":
                raise ValueError(f"BooleanQuery child must be <Clause>, got <{c.tag}>")
            occ = _OCCURS.get(c.get("occurs", "should").lower())
            if occ is None:
                raise ValueError(f"invalid occurs value {c.get('occurs')!r}")
            sub = [_build(x) for x in c]
            if len(sub) != 1:
                raise ValueError("<Clause> must hold exactly one query element")
            clauses.append(BooleanClause(sub[0], occ))
        msm = int(e.get("minimumNumberShouldMatch", "0"))
        return _boost(e, BooleanQuery(tuple(clauses), msm))
    if tag == "DisjunctionMaxQuery":
        return _boost(
            e,
            DisjunctionMaxQuery(
                tuple(_build(c) for c in e), float(e.get("tieBreaker", "0.0"))
            ),
        )
    if tag == "ConstantScoreQuery":
        sub = [_build(c) for c in e]
        if len(sub) != 1:
            raise ValueError("ConstantScoreQuery needs exactly one child")
        return _boost(e, ConstantScoreQuery(sub[0]))
    if tag == "RangeQuery":
        return _boost(
            e,
            TermRangeQuery(
                lower=e.get("lowerTerm"),
                upper=e.get("upperTerm"),
                include_lower=e.get("includeLower", "true").lower() == "true",
                include_upper=e.get("includeUpper", "true").lower() == "true",
            ),
        )
    if tag == "SpanNear":
        slop_attr = e.get("slopNum", e.get("slop"))
        if slop_attr is None:
            raise ValueError("SpanNear requires a slopNum attribute")
        return SpanNearQuery(
            tuple(_span_slot(c) for c in e),
            slop=int(slop_attr),
            in_order=e.get("inOrder", "false").lower() == "true",
        )
    if tag == "SpanNot":
        inc = [c for c in e if c.tag == "Include"]
        exc = [c for c in e if c.tag == "Exclude"]
        if len(inc) != 1 or len(exc) != 1:
            raise ValueError("SpanNot needs one <Include> and one <Exclude>")
        inc_q = [_build(c) for c in inc[0]]
        if len(inc_q) != 1 or not isinstance(inc_q[0], SpanNearQuery):
            raise ValueError("SpanNot <Include> must hold one SpanNear")
        exc_terms = []
        for c in exc[0]:
            slot = _span_slot(c)
            exc_terms.extend(slot if isinstance(slot, tuple) else (slot,))
        return SpanNotQuery(
            include=inc_q[0],
            exclude_terms=tuple(exc_terms),
            pre=int(e.get("pre", "0")),
            post=int(e.get("post", "0")),
        )
    if tag == "UserQuery":
        from lucene_spark.search.queryparser import parse_query

        return _boost(e, parse_query((e.text or "").strip()))
    raise ValueError(f"unsupported query element <{tag}>")


def xml_parse(xml: str) -> Query:
    """Parse an XML query string → engine query tree. The root may be
    any supported query element (CoreParser.parse's TopLevelQuery)."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise ValueError(f"malformed query XML: {exc}") from exc
    return _build(root)
